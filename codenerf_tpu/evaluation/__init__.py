from codenerf_tpu.evaluation.metrics import psnr, reference_psnr_mse, ssim

__all__ = ["psnr", "ssim", "reference_psnr_mse"]
