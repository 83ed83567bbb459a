from gsvc_tpu.parallel.sharded import (  # noqa: F401
    fit_frame_sharded,
    make_sharded_train_step,
    replicate_to_mesh,
    shard_frames_mesh,
    tile_mesh,
)
