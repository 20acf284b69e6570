from cheque_ocr_project_ray.sources.io import MediaStore, read_cheques, read_meta

__all__ = ["MediaStore", "read_cheques", "read_meta"]
