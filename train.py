#!/usr/bin/env python
"""Supervised VSR training — reference CLI surface
(``python train.py +experiment=basic``)."""
from vsrlab_tpu.train.train import main

if __name__ == "__main__":
    main()
