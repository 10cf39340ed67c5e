"""Host-side IO: image decode/encode, dataset loaders, visualization."""

from sift_tpu.io.image import load_image_gray, save_image_gray, save_image_rgb

__all__ = ["load_image_gray", "save_image_gray", "save_image_rgb"]
