from cheque_ocr_project_ray.state.drawer_dict import build_drawer_dict

__all__ = ["build_drawer_dict"]
