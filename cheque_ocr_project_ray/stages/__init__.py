from cheque_ocr_project_ray.stages.ocr import OcrStage
from cheque_ocr_project_ray.stages.extract import FieldExtractStage

__all__ = ["OcrStage", "FieldExtractStage"]
