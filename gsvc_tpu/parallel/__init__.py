from gsvc_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_train_step,
    make_tile_sharded_render,
    shard_frames_mesh,
)
