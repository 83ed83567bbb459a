from gsvc_tpu.utils.losses import loss_fn  # noqa: F401
from gsvc_tpu.utils.metrics import ms_ssim, psnr, ssim  # noqa: F401
from gsvc_tpu.utils.logwriter import LogWriter  # noqa: F401
from gsvc_tpu.utils.control import EarlyStopping, detect_outliers_mean_diff  # noqa: F401
