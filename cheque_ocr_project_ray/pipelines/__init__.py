from cheque_ocr_project_ray.pipelines.cheque import build_cheque_pipeline

__all__ = ["build_cheque_pipeline"]
