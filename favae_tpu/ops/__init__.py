from favae_tpu.ops.gaussian import gaussian_kernel_1d, gaussian_kernel_2d, gaussian_blur_nhwc
from favae_tpu.ops.ffl import focal_frequency_loss
