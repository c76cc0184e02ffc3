from .image import flip_array, label2colormap, masked_image, read_label, save_mask
from .meters import AverageMeter

__all__ = ["AverageMeter", "flip_array", "label2colormap", "masked_image",
           "read_label", "save_mask"]
