"""Autotune sweep harness: timing, visible skips, persistence round trip."""
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.models import shan_chen as sc
from multiphase_lbm_tpu.ops import autotune, pallas_sc


def test_sweep_orders_results_and_records_skips(tmp_path):
    p = sc.SCParams()
    nx, ny = 128, 32
    f = sc.init_droplet(nx, ny, p, radius=6.0, dtype=jnp.float32)
    m32 = sc.geometry_periodic(nx, ny).astype(jnp.float32)

    configs = autotune.grid(tile=[8, 16], nsub=[1, 13])  # nsub=13 > halo/2

    def make_step(cfg):
        return lambda s: pallas_sc.run_fused(s, m32, p, 4, periodic=True,
                                             interpret=True, halo=8, **cfg)

    results = autotune.sweep(make_step, f, n_steps=4, cells=nx * ny,
                             configs=configs, reps=2, verbose=None)
    assert len(results) == 4
    timed = [r for r in results if "mlups" in r]
    skipped = [r for r in results if "skipped" in r]
    # nsub=13 exceeds the 8-row halo's 2-rows-per-substep validity → the
    # kernel's loud guard fires and the config must surface as a skip
    assert len(skipped) == 2 and all(
        r["config"]["nsub"] == 13 for r in skipped)
    assert timed == sorted(timed, key=lambda r: -r["mlups"])

    path = str(tmp_path / "tuned.json")
    autotune.save_table(path, "pallas_sc", f.shape, f.dtype, results)
    table = autotune.load_table(path)
    best = autotune.lookup(table, "pallas_sc", f.shape, f.dtype)
    assert best == timed[0]["config"]
    assert autotune.lookup(table, "pallas_sc", (9, 1, 1), f.dtype) is None

    # merge semantics: a second save under another key keeps the first
    autotune.save_table(path, "pallas_hcz", f.shape, f.dtype, results)
    table = autotune.load_table(path)
    assert autotune.lookup(table, "pallas_sc", f.shape, f.dtype) == best


def test_sweep_budget_skips_remaining():
    p = sc.SCParams()
    nx, ny = 128, 32
    f = sc.init_droplet(nx, ny, p, radius=6.0, dtype=jnp.float32)
    m32 = sc.geometry_periodic(nx, ny).astype(jnp.float32)

    def make_step(cfg):
        return lambda s: pallas_sc.run_fused(s, m32, p, 2, periodic=True,
                                             interpret=True, halo=8, **cfg)

    results = autotune.sweep(make_step, f, n_steps=2, cells=nx * ny,
                             configs=autotune.grid(tile=[8, 16, 32]),
                             reps=1, budget_s=0.0, verbose=None)
    # budget 0: every config after the clock check is a visible skip
    assert all(r.get("skipped") == "budget" for r in results)
    assert np.isfinite(np.asarray(f)).all()


def test_save_table_survives_corrupt_file(tmp_path):
    """A truncated table (interrupted save) must be preserved aside, not
    silently absorbed into an empty table that clobbers other winners."""
    path = str(tmp_path / "tuned.json")
    with open(path, "w") as fh:
        fh.write('{"pallas_sc|truncat')      # torn write
    results = [{"config": {"tile": 8}, "mlups": 1.0, "ms_per_step": 1.0,
                "spread": 0.0}]
    autotune.save_table(path, "pallas_hcz", (9, 8, 8), "float32", results)
    table = autotune.load_table(path)
    assert autotune.lookup(table, "pallas_hcz", (9, 8, 8),
                           "float32") == {"tile": 8}
    import os
    assert os.path.exists(path + ".corrupt")
