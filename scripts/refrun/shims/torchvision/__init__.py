"""torchvision shim (reference uses only Resize/InterpolationMode/
GaussianBlur/save_image — see /root/reference/utils.py:7-8,
utils_vid.py:7, MPV.py:4,144,161)."""
from . import transforms, utils  # noqa: F401
