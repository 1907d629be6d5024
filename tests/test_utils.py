"""Utils tests: seeding, timers, profiler surface."""

import jax
import numpy as np

from vsrlab_tpu.core.config import Config
from vsrlab_tpu.utils import Timer, annotate, seed_everything, seed_index_everything


class TestSeed:
    def test_seed_everything_deterministic(self):
        k1 = seed_everything(123)
        a = np.random.rand(3)
        k2 = seed_everything(123)
        b = np.random.rand(3)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))

    def test_seed_index_everything_config(self):
        cfg = Config.from_dict({"seed_index": 7})
        k = seed_index_everything(cfg)
        np.testing.assert_array_equal(
            np.asarray(k), np.asarray(jax.random.PRNGKey(7))
        )
        # sanity default when unset (reference run_id "sanity" convention)
        k = seed_index_everything(Config.from_dict({"seed_index": None}))
        np.testing.assert_array_equal(
            np.asarray(k), np.asarray(jax.random.PRNGKey(42))
        )


class TestTimer:
    def test_accumulates(self):
        t = Timer()
        with t("a"):
            pass
        with t("a"):
            pass
        with t("b"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2 and s["b"]["count"] == 1
        assert s["a"]["total_s"] >= 0

    def test_annotation_context(self):
        with annotate("phase"):
            x = jax.numpy.ones(4) * 2
        assert float(x.sum()) == 8.0
