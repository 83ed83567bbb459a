from gsvc_tpu.optim.adan import AdanState, adan_init, adan_step, adan_reset_moments  # noqa: F401
from gsvc_tpu.optim.schedule import step_lr  # noqa: F401
