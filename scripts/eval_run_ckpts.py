"""On-chip raw-vs-EMA checkpoint evaluation for a finished training run —
the AUTHORITATIVE checkpoint-selection protocol (BENCH_NOTES r5 "run 007
landed": full frozen val split, training-time network config (bf16 fast
path on TPU), runner validation metrics — the numbers line up exactly with
the run's own logged validations; CPU-subset protocols have flipped the
raw/EMA ranking at <0.1 dB deltas and must not be used for selection).

    python scripts/eval_run_ckpts.py experiments/008_*/ [--iters 8000,9000]
"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # yml dataroots/ckpt paths are repo-relative (reference convention)
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir", help="experiments/<run>/ directory")
    ap.add_argument("--iters", default=None,
                    help="comma-separated iteration numbers (default: all saved)")
    ap.add_argument("--pretrain", default=None,
                    help=".pth used as the Orbax restore template (default: "
                         "the yml's pretrain_network_g)")
    args = ap.parse_args()

    ymls = glob.glob(os.path.join(args.exp_dir, "*.yml"))
    assert len(ymls) == 1, f"expected one yml in {args.exp_dir}, got {ymls}"
    import yaml

    with open(ymls[0]) as f:
        opt = yaml.safe_load(f)
    opt["is_train"] = False
    pretrain = args.pretrain or opt.get("path", {}).get("pretrain_network_g")
    opt["path"] = {
        "pretrain_network_g": pretrain,
        "models": "/tmp/eval_run/models",
        "training_states": "/tmp/eval_run/states",
        "visualization": "/tmp/eval_run/vis",
    }
    opt["dist"] = False

    from wavemamba_tpu.data import ThreadedLoader, build_dataset, device_prefetch
    from wavemamba_tpu.runner import build_model
    from wavemamba_tpu.train.checkpoint import load_network

    val_set = build_dataset(opt["datasets"]["val"])
    print(f"val images: {len(val_set)} ({opt['datasets']['val']['name']})",
          flush=True)
    model = build_model(opt)

    models_dir = os.path.join(args.exp_dir, "models")
    if args.iters:
        its = [int(x) for x in args.iters.split(",")]
    else:
        its = sorted({int(d.rsplit("_", 1)[1]) for d in os.listdir(models_dir)
                      if d.rsplit("_", 1)[-1].isdigit()})
    labels = []
    for it in its:
        labels += [f"net_g_{it}", f"net_g_ema_{it}"]

    results = {}
    for label in labels:
        path = os.path.join(models_dir, label)
        if not os.path.isdir(path):
            print(f"{label}: missing", flush=True)
            continue
        model.params = load_network(path, template=model.params)
        loader = ThreadedLoader(val_set, batch_size=1, num_workers=2)
        t0 = time.time()
        avg, _ = model.validation(device_prefetch(loader), current_iter=label,
                                  save_img=False)
        results[label] = avg
        print(f"{label}: " + ", ".join(f"{k}={v:.4f}" for k, v in avg.items())
              + f" ({time.time() - t0:.1f}s)", flush=True)
    if results:
        key = opt.get("val", {}).get("key_metric", "psnr")
        best = max(results, key=lambda l: results[l].get(key, float("-inf")))
        print(f"BEST by {key}: {best} ({results[best]})", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
