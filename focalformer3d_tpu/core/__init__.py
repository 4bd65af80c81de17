from . import assigner, box_coder, boxes, gaussian, hungarian, iou, losses, nms  # noqa: F401
