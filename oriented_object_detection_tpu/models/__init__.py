from .yolo11_obb import YOLO11OBB, SCALES  # noqa: F401
