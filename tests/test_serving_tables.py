"""Per-chip serving-table loading (models/hifigan.py serving_tables)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficient_tts_tpu.models import hifigan as hg
from efficient_tts_tpu.models.hifigan import HiFiGANConfig


@pytest.fixture(autouse=True)
def _reset_tables():
    hg.reset_serving_tables()
    yield
    os.environ.pop("EFTS_TPU_SERVING_TABLES", None)
    hg.reset_serving_tables()


def test_builtin_tables_active_by_default():
    t = hg.serving_tables()
    assert t["source"] == "builtin-v5e"
    assert t["mrf_strategy"] == {} and t["ups_impl"] == {}
    # builtin fallbacks still resolve
    assert hg._strategy(64, 3, 1) == "plain"
    assert hg._strategy(32, 3, 1) == "packed"
    assert hg.resolve_ups_impl("auto", 2, 4, 64) == "subpixel_packed"
    assert hg.resolve_ups_impl("auto", 8, 16, 512) == "dilated"


def test_env_table_overrides_builtins(tmp_path):
    p = tmp_path / "tables.json"
    p.write_text(json.dumps({
        "device_kind": "test_chip",
        "mrf_strategy": {"64,3,1": "packed"},
        "ups_impl": {"8,16,512": "subpixel"},
        "pallas_t_tile": {"32": 512},
    }))
    os.environ["EFTS_TPU_SERVING_TABLES"] = str(p)
    hg.reset_serving_tables()
    t = hg.serving_tables()
    assert t["source"] == str(p)
    assert hg._strategy(64, 3, 1) == "packed"       # tuned
    assert hg._strategy(64, 3, 3) == "plain"        # untouched -> builtin
    assert hg.resolve_ups_impl("auto", 8, 16, 512) == "subpixel"
    assert hg.resolve_ups_impl("auto", 2, 4, 64) == "subpixel_packed"
    assert hg._t_tile(32) == 512
    assert hg._t_tile(64) == 1024                    # builtin


def test_malformed_table_falls_back(tmp_path):
    p = tmp_path / "broken.json"
    p.write_text("{not valid json")
    os.environ["EFTS_TPU_SERVING_TABLES"] = str(p)
    hg.reset_serving_tables()
    t = hg.serving_tables()
    assert t["source"] == "builtin-v5e"
    assert hg._strategy(64, 3, 1) == "plain"


def test_tuned_tables_change_strategy_not_output(tmp_path):
    """Any strategy assignment is exact: forcing a full tuned table must
    reproduce the default generator output bit-for-bit at f32."""
    cfg = HiFiGANConfig(
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=128,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
    )
    params = hg.init_generator(jax.random.PRNGKey(0), cfg)
    mel = np.random.default_rng(0).standard_normal((2, 32, 80)).astype(np.float32)
    ref = np.asarray(hg.generator(params, mel, cfg))

    p = tmp_path / "tables.json"
    p.write_text(json.dumps({
        "mrf_strategy": {f"{c},3,{d}": "plain" for c in (64, 32, 16)
                         for d in (1, 2)},
        "ups_impl": {},
    }))
    os.environ["EFTS_TPU_SERVING_TABLES"] = str(p)
    hg.reset_serving_tables()
    out = np.asarray(hg.generator(params, mel, cfg))
    np.testing.assert_allclose(out, ref, atol=1e-5)
