#!/usr/bin/env python
"""One-command torch-checkpoint conversion: .pth -> orbax checkpoint.

Turnkey path for day-one with the reference model zoo (reference
README.md:30-39): download a released .pth, run

    python tools/convert_ckpt.py ckpts/coocc_multi.pth coocc_multi_r50_256x704

and get a `<pth-stem>_jax/` orbax directory loadable by tools/test.py
--checkpoint and train/loop.py resume. Optionally smoke-evals the
converted weights (--eval-synthetic) so a broken name-map fails loudly
instead of silently producing a random-init model.

The conversion itself is coocc_tpu/train/convert_torch.py (leaf-certified
against every shipped config in tests/test_convert_cli.py); this CLI adds
the structural audit (missing/extra/shape-mismatched leaves are PRINTED,
not warn-logged) and the orbax save in the layout the other CLIs expect
({"state": {params, batch_stats}, "epoch"}).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pth", help="torch checkpoint (.pth) path")
    p.add_argument("config", help="config name (coocc_tpu.config names)")
    p.add_argument("--out", default=None,
                   help="output orbax dir (default: <pth-stem>_jax)")
    p.add_argument("--eval-synthetic", action="store_true",
                   help="run a 2-batch synthetic eval with the converted "
                        "weights and print the SSC table")
    p.add_argument("--strict", action="store_true",
                   help="fail (exit 1) on any missing/extra/mismatched leaf")
    args = p.parse_args()

    import numpy as np
    import torch

    import jax

    from coocc_tpu.config import get_config
    from coocc_tpu.models.coocc_ray import CoOccRay
    from coocc_tpu.train.checkpoint import CheckpointManager
    from coocc_tpu.train.convert_torch import convert_coocc_ray

    cfg = get_config(args.config)
    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    print(f"loaded {args.pth}: {len(sd)} tensors")

    variables = convert_coocc_ray(sd, cfg)

    # --- structural audit against a shape-only init (no compute)
    model = CoOccRay(cfg=cfg)
    from coocc_tpu.data.synthetic import synthetic_batch
    batch = jax.tree.map(np.asarray, synthetic_batch(cfg, batch_size=1))
    ref = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch, train=True, fine_rng=jax.random.PRNGKey(2)))

    def leaf_shapes(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            q = f"{prefix}/{k}"
            if isinstance(v, dict):
                out.update(leaf_shapes(v, q))
            else:
                out[q] = tuple(np.shape(v))
        return out

    problems = 0
    for col in ("params", "batch_stats"):
        want = leaf_shapes(ref.get(col, {}))
        got = leaf_shapes(variables.get(col, {}))
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        bad = [(k, got[k], want[k]) for k in sorted(set(want) & set(got))
               if got[k] != want[k]]
        problems += len(missing) + len(extra) + len(bad)
        for k in missing:
            print(f"  MISSING {col}{k}  (stays at random init)")
        for k in extra:
            print(f"  EXTRA   {col}{k}  (no flax leaf; dropped)")
        for k, g, w in bad:
            print(f"  SHAPE   {col}{k}  converted {g} != model {w}")
    if problems:
        print(f"audit: {problems} problem leaves")
        if args.strict:
            sys.exit(1)
        # overlay onto a real init so the saved tree is complete
        from coocc_tpu.train.convert_torch import _fill_missing
        from coocc_tpu.utils.init_utils import jit_init
        real_ref = jit_init(
            model,
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            batch, train=True, fine_rng=jax.random.PRNGKey(2))
        variables = _fill_missing(real_ref, variables)
    else:
        print("audit: clean — every model leaf converted, no strays")

    out_dir = args.out or (os.path.splitext(args.pth)[0] + "_jax")
    mgr = CheckpointManager(out_dir)
    state = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats")}
    mgr.save({"state": state, "epoch": 0}, epoch=0)
    print(f"saved orbax checkpoint -> {out_dir}/epoch_0 "
          f"(use: tools/test.py {args.config} --checkpoint {out_dir})")

    if args.eval_synthetic:
        import jax.numpy as jnp

        from coocc_tpu.evaluation.formatting import format_ssc_table
        from coocc_tpu.evaluation.ssc_metrics import SSCMetrics
        from coocc_tpu.parallel.train_step import make_eval_step

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        emodel = CoOccRay(cfg=cfg, dtype=dtype)
        eval_step = make_eval_step(emodel, cfg, return_logits=False)
        metrics = SSCMetrics(cfg.num_classes)
        var_dev = {"params": variables["params"]}
        if variables.get("batch_stats"):
            var_dev["batch_stats"] = variables["batch_stats"]
        for i in range(2):
            b = jax.tree.map(
                lambda x: None if x is None else jnp.asarray(x),
                synthetic_batch(cfg, batch_size=1, seed=3000 + i),
                is_leaf=lambda x: x is None)
            out = eval_step(var_dev, b)
            metrics.update_from_hists(np.asarray(out["SC_hist"]),
                                      np.asarray(out["SSC_hist"]))
        print(format_ssc_table(metrics.result(), cfg.class_names))


if __name__ == "__main__":
    main()
