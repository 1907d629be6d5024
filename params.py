#!/usr/bin/env python
"""Per-model parameter/speed bench — reference CLI surface."""
from vsrlab_tpu.evaluation.params_bench import main

if __name__ == "__main__":
    main()
