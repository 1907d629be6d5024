#!/usr/bin/env python
"""GAN fine-tuning — reference CLI surface (``python train_gan.py
+experiment=basic_gan``)."""
from vsrlab_tpu.train.gan import main

if __name__ == "__main__":
    main()
