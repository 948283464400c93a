from .torch_import import (
    convert_linas_dual_encoding, convert_clip_vit, convert_timesformer,
    convert_clip_resnet, clip_resnet_config_from_sd,
    convert_combiner, combiner_config_from_sd,
    convert_yolov5, yolo_config_from_torch,
    convert_yolov5_cls, yolo_cls_config_from_torch,
    convert_swin3d,
    load_torch_checkpoint,
)
