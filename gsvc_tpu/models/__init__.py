from gsvc_tpu.models.represent import (  # noqa: F401
    FitResult,
    TrainState,
    fit_frame,
    init_train_state,
    pre_train_frame,
    render_frame,
)
