"""Torch-reference side of the full-data ablation (VERDICT r2 item 2).

Round 2's synthetic ablation found the regime inversion: at the
formatter-default window count the plain forecaster (ATA_no) beats the
GP-blur flagship (ATA_gp), the opposite of the reference's real-data
headline ordering.  This script answers "is that inversion caused by this
framework's implementation or by the synthetic data?" by training the
ACTUAL reference composition — the reference's own
``modules.transformer.Transformer`` (imported from /root/reference) inside
``tests/_torch_gp_ref.TorchForecastDenoising`` (the exact math of the
reference's gpytorch stack, lemma-pinned against our DeepGP by
``test_torch_gp_marginals_match_jax_gp``) — on the IDENTICAL synthetic
windows, split by the identical formatter + window sampler, under the
identical Noam-Adam law (reference ``train.py:103-110``).

If the torch reference shows the same ordering at the same window budgets,
the inversion is data-caused and the framework matches the reference's
behavior; RESULTS.md records the two-sided table.

Torch on this 1-CPU host is ~3 orders of magnitude slower than the TPU
path, so the protocol is scaled (windows/epochs/d_model via flags) and the
jax side must be re-run at the SAME scale for the comparison
(scripts/run.sh --synthetic ... with matching flags).

Usage (one variant per invocation; run gp / iso / no):
    python scripts/ablation_torch_side.py --variant gp \
        --train_windows 2048 --epochs 8 --pred_len 24 --d_model 16

Round 4 adds the *converged* protocol (VERDICT r3 item 1): per-epoch
validation, best-val checkpoint restore before the test eval (the
reference's own checkpointing semantics, ``train.py:181-187``), and
``--patience`` plateau early-stop so "converged" is a measured property
(the val curve flattens) rather than a fixed budget.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
REF = "/root/reference"
if not os.path.isdir(REF):
    raise SystemExit("reference repo not mounted at /root/reference")
sys.path.insert(0, REF)

import torch  # noqa: E402

from _torch_gp_ref import TorchForecastDenoising  # noqa: E402
from modules.opt_model import NoamOpt  # noqa: E402
from modules.transformer import Transformer as RefTransformer  # noqa: E402

from fine_grained_gaussian_process_forcasting_tpu.data.experiment import (  # noqa: E402
    ExperimentConfig,
)
from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (  # noqa: E402
    make_synthetic_frame,
)
from fine_grained_gaussian_process_forcasting_tpu.data.window import (  # noqa: E402
    batch_sampled_data,
)


def load_split(args):
    """Identical data spine to train/cli.py + train/harness.py:_split_data."""
    raw = make_synthetic_frame(args.exp_name, num_entities=8,
                               steps_per_entity=1600, seed=0,
                               noise=args.synthetic_noise,
                               profile=args.synthetic_profile)
    config = ExperimentConfig(args.pred_len, args.exp_name,
                              root_folder=os.path.join(args.out_dir,
                                                       "outputs"))
    formatter = config.make_data_formatter()
    data = formatter.transform_data(raw)
    params = formatter.get_experiment_params()
    model_params = formatter.get_default_model_params()
    batch_size = model_params["minibatch_size"][0]
    train_max, valid_max = formatter.get_num_samples_for_calibration()
    if args.train_windows:
        train_max = args.train_windows
    if args.valid_windows:
        valid_max = args.valid_windows
    cap = min(train_max, valid_max)
    if cap < batch_size:
        batch_size = max(1, cap)
    if args.batch_size:
        batch_size = args.batch_size
    return batch_sampled_data(
        data, 0.8, (train_max, valid_max), params["total_time_steps"],
        params["num_encoder_steps"], args.pred_len,
        params["column_definition"], batch_size,
    ), model_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", choices=["gp", "iso", "no"], required=True)
    p.add_argument("--exp_name", default="solar")
    p.add_argument("--synthetic_noise", default="gp",
                   choices=["iid", "ar1", "gp"])
    p.add_argument("--synthetic_profile", default="stationary",
                   choices=["stationary", "field"])
    p.add_argument("--pred_len", type=int, default=24)
    p.add_argument("--train_windows", type=int, default=2048)
    p.add_argument("--valid_windows", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=0,
                   help="0 = formatter default")
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--d_model", type=int, default=16)
    p.add_argument("--stack_size", type=int, default=1)
    p.add_argument("--warmup", type=int, default=4000)
    p.add_argument("--num_inducing", type=int, default=256)
    p.add_argument("--out", default="results_r3/torch_ablation.jsonl")
    p.add_argument("--out_dir", default=".")
    p.add_argument("--max_test_batches", type=int, default=0,
                   help="0 = all")
    p.add_argument("--patience", type=int, default=0,
                   help="stop after N epochs without val-MSE improvement "
                        "(0 = train the full --epochs budget)")
    p.add_argument("--min_epochs", type=int, default=0,
                   help="never early-stop before this many epochs")
    args = p.parse_args()

    torch.set_num_threads(max(1, os.cpu_count() or 1))
    torch.manual_seed(args.seed)
    (train, valid, test), model_params = load_split(args)
    n_heads = model_params["num_heads"]
    d_k = args.d_model // n_heads

    feat_e = train.enc.shape[-1]
    feat_d = train.dec.shape[-1]
    backbone = RefTransformer(
        src_input_size=feat_e, tgt_input_size=feat_d,
        pred_len=args.pred_len, d_model=args.d_model,
        d_ff=args.d_model * 4, d_k=d_k, d_v=d_k, n_heads=n_heads,
        n_layers=args.stack_size, src_pad_index=0, tgt_pad_index=0,
        device="cpu", attn_type="ATA", seed=args.seed)
    model = TorchForecastDenoising(
        backbone, src_input_size=feat_e, tgt_input_size=feat_d,
        d_model=args.d_model, pred_len=args.pred_len,
        gp=(args.variant == "gp"),
        denoise=(args.variant != "no"),
        no_noise=False,
        num_inducing=args.num_inducing)
    opt = NoamOpt(torch.optim.Adam(model.parameters(), lr=0.0,
                                   betas=(0.9, 0.98), eps=1e-9),
                  2, args.d_model, args.warmup)

    def to_t(x):
        return torch.tensor(np.asarray(x))

    def eval_mse(split, max_batches=0):
        model.eval()
        sq = n = 0
        n_b = split.enc.shape[0]
        if max_batches:
            n_b = min(n_b, max_batches)
        with torch.no_grad():
            for bi in range(n_b):
                pred, _, _ = model(to_t(split.enc[bi]), to_t(split.dec[bi]))
                err = np.asarray(pred) - np.asarray(split.y[bi])
                sq += float((err ** 2).sum())
                n += err.size
        model.train()
        return sq / max(n, 1)

    nb = train.enc.shape[0]
    rng = np.random.default_rng(args.seed)
    model.train()
    t0 = time.time()
    val_curve = []
    best_val, best_state, best_epoch, stale = float("inf"), None, -1, 0
    epochs_run = 0
    for epoch in range(args.epochs):
        order = rng.permutation(nb)
        ep_loss = 0.0
        for bi in order:
            enc = to_t(train.enc[bi])
            dec = to_t(train.dec[bi])
            y = to_t(train.y[bi])
            _, loss, mse = model(enc, dec, y)
            opt.zero_grad()
            loss.backward()
            opt.step_and_update_lr()
            ep_loss += float(mse.detach())
        epochs_run = epoch + 1
        val_mse = eval_mse(valid)
        val_curve.append(round(val_mse, 5))
        if val_mse < best_val:
            best_val, best_epoch, stale = val_mse, epoch, 0
            best_state = {k: v.detach().clone()
                          for k, v in model.state_dict().items()}
        else:
            stale += 1
        print(f"[{args.variant} seed {args.seed}] epoch {epoch}: "
              f"train mse {ep_loss / nb:.4f} val mse {val_mse:.4f}"
              f"{' *' if best_epoch == epoch else ''} "
              f"({time.time() - t0:.0f}s elapsed)", flush=True)
        if (args.patience and stale >= args.patience
                and epoch + 1 >= args.min_epochs):
            print(f"[{args.variant} seed {args.seed}] early stop at epoch "
                  f"{epoch} (no val improvement in {stale}; "
                  f"best {best_val:.4f} @ {best_epoch})", flush=True)
            break

    if best_state is not None:
        model.load_state_dict(best_state)
    model.eval()
    errs_sq, errs_abs, n_pts = 0.0, 0.0, 0
    tb = test.enc.shape[0]
    if args.max_test_batches:
        tb = min(tb, args.max_test_batches)
    with torch.no_grad():
        for bi in range(tb):
            pred, _, _ = model(to_t(test.enc[bi]), to_t(test.dec[bi]))
            err = np.asarray(pred) - np.asarray(test.y[bi])
            errs_sq += float((err ** 2).sum())
            errs_abs += float(np.abs(err).sum())
            n_pts += err.size
    mse = errs_sq / n_pts
    mae = errs_abs / n_pts
    row = {
        "side": "torch_reference", "variant": args.variant,
        "seed": args.seed, "pred_len": args.pred_len,
        "train_windows": int(args.train_windows),
        "epochs": args.epochs, "d_model": args.d_model,
        "noise": args.synthetic_noise,
        "profile": args.synthetic_profile,
        "test_mse": round(mse, 5), "test_mae": round(mae, 5),
        "train_seconds": round(time.time() - t0, 1),
        "epochs_run": epochs_run, "best_val_epoch": best_epoch,
        "best_val_mse": round(best_val, 5), "val_curve": val_curve,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
