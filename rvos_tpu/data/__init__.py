from .datasets import (
    DAVISTest,
    DAVISTrain,
    SyntheticEval,
    SyntheticTrain,
    VOSTestSeq,
    VOSTrain,
    YTBVOSTest,
    YTBVOSTrain,
)
from .loader import PrefetchLoader, TrainBatcher
from .perturb import box_blur, gaussian_noise, get_perturbation, salt_and_pepper
from .transforms import (
    balanced_random_crop,
    eval_variants,
    normalize,
    random_hflip,
    random_scale,
    restrict_size,
    snap_16,
)

__all__ = [
    "DAVISTest", "DAVISTrain", "PrefetchLoader", "SyntheticEval",
    "SyntheticTrain", "TrainBatcher", "VOSTestSeq", "VOSTrain", "YTBVOSTest",
    "YTBVOSTrain", "balanced_random_crop", "box_blur", "eval_variants",
    "gaussian_noise", "get_perturbation", "normalize", "random_hflip",
    "random_scale", "restrict_size", "salt_and_pepper", "snap_16",
]
