#!/usr/bin/env python
"""Evaluation harness — reference CLI surface (fps x crf sweep)."""
from vsrlab_tpu.evaluation.harness import main

if __name__ == "__main__":
    main()
