#!/usr/bin/env python
"""CLI entry point — reference-compatible launch:

  python train_video_Compress.py --dataset <video.yuv> \
      --model_path checkpoints/models/<name>/gmodels_state_dict.npz \
      --data_name Beauty --num_points 10000 --iterations 50000 --is_rm
"""

import sys

from gsvc_tpu.drivers.compress import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
