from guassianhand_tpu.train.losses import compute_error, pix_loss, LossWeights
from guassianhand_tpu.train.metrics import psnr, ssim, mse
