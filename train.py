"""CLI: python train.py --config=configs/CVPR_inverse_scaling.yaml

API-surface parity with the reference entry point
(/root/reference/train.py:353-367): trains the experiment described by the
YAML config and writes results/<experiment>/{config.yaml, ckpts/,
weights.msgpack, val.csv}.
"""

import argparse
import faulthandler
import signal

# kill -USR1 <pid> dumps all thread stacks to stderr without disturbing
# the run — the only hang-diagnosis tool on this box (no py-spy/gdb), and
# the round-3 spin-hang (futex churn at ~94% CPU, no device IO) is
# invisible to the watchdog's frozen-CPU detector.
faulthandler.register(signal.SIGUSR1, all_threads=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--capacity", default="auto",
                    help="static per-batch point capacity (int or 'auto')")
    ap.add_argument("--max_steps_per_epoch", type=int, default=None)
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed (DCN multi-host) from "
                         "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                         "JAX_PROCESS_ID before device use; no-op when "
                         "unset (upcc_tpu/parallel/multihost.py)")
    args = ap.parse_args()

    if args.multihost:
        from upcc_tpu.parallel.multihost import initialize
        if initialize():
            import jax
            print(f"multihost: process {jax.process_index()} of "
                  f"{jax.process_count()}, {jax.device_count()} devices")

    cap = args.capacity if args.capacity == "auto" else int(args.capacity)
    from upcc_tpu.training.trainer import Training
    Training(args.config, capacity=cap,
             max_steps_per_epoch=args.max_steps_per_epoch).train()


if __name__ == "__main__":
    main()
