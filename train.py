#!/usr/bin/env python3
"""Public CLI shim — preserves the reference's entry point signature:

    python train.py <action> [--model --path --input_dim --hidden_dim
                              --latent_dim --learning_rate --epochs]

(reference src/train.py:3756-3821).  See ``patent_tpu/cli/main.py``.
"""

import sys

from patent_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
