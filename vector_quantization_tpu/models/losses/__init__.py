from .recon import l1_loss, mse_loss, psnr, ssim
