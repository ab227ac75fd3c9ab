"""int8 serving accuracy on a TRAINED checkpoint (vs fp32 serving).

Loads a field-study best-validation checkpoint and scores the test split
through InferenceSession twice (fp32 / quantize='int8'), reporting MSE/
MAE for both plus the prediction-level quantization error.  Completes
the int8 capability's evidence: tests/test_quantize.py pins the op math
on random inits; this pins end-task accuracy on trained weights.

Usage:
  python scripts/int8_accuracy_check.py \
      [--ckpt_dir results_r3/abl_field_gp512_fix] [--seed 8220]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)
from fine_grained_gaussian_process_forcasting_tpu.train.harness import (
    ExperimentHarness,
    HarnessArgs,
)
from fine_grained_gaussian_process_forcasting_tpu.train.predict import (
    InferenceSession,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default="results_r3/abl_field_gp512_fix")
    ap.add_argument("--name", default="ATA_gp512fix_solar_96_{seed}_denoise_gp")
    ap.add_argument("--seed", type=int, default=8220)
    ap.add_argument("--num_inducing", type=int, default=512)
    args = ap.parse_args()

    raw = make_synthetic_frame("solar", num_entities=8,
                               steps_per_entity=1600, seed=0,
                               noise="gp", profile="field")
    h = ExperimentHarness(raw, HarnessArgs(
        exp_name="solar", model_name="int8check", attn_type="ATA",
        pred_len=96, seed=args.seed, num_inducing=args.num_inducing,
        out_dir="/tmp/int8check"))
    model = h._make_model(32, 1)
    name = args.name.format(seed=args.seed)

    # template params for orbax restore
    from fine_grained_gaussian_process_forcasting_tpu.train.trainer import (
        Trainer,
    )

    trainer = Trainer(model, d_model=32)
    state = trainer.init_state(jax.random.PRNGKey(0), h.test_data.enc[0],
                               h.test_data.dec[0], h.test_data.y[0])
    template = jax.device_get(state.params)

    model_path = os.path.join(args.ckpt_dir, "models_solar_96")
    out = {}
    preds = {}
    for tag, q in (("fp32", None), ("int8", "int8")):
        sess = InferenceSession.from_checkpoint(
            model, model_path, name, template, batch_size=256, quantize=q)
        nb, bs = h.test_data.enc.shape[:2]
        p = sess.predict(h.test_data.enc.reshape(nb * bs, *h.test_data.enc.shape[2:]),
                         h.test_data.dec.reshape(nb * bs, *h.test_data.dec.shape[2:]))
        y = h.test_data.y.reshape(nb * bs, *h.test_data.y.shape[2:])
        preds[tag] = p
        out[f"{tag}_mse"] = float(np.mean((p - y) ** 2))
        out[f"{tag}_mae"] = float(np.mean(np.abs(p - y)))
    d = np.abs(preds["int8"] - preds["fp32"])
    out["pred_max_abs_delta"] = float(d.max())
    out["pred_rms_delta"] = float(np.sqrt(np.mean(d ** 2)))
    out["mse_rel_change_pct"] = 100.0 * (out["int8_mse"] - out["fp32_mse"]) \
        / out["fp32_mse"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
