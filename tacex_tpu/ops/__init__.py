from .blur import box_dilate, gaussian_blur, kernel_size_for_sigma  # noqa: F401
