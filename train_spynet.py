#!/usr/bin/env python
"""Progressive SpyNet curriculum training — reference CLI surface."""
from vsrlab_tpu.train.spynet import main

if __name__ == "__main__":
    main()
