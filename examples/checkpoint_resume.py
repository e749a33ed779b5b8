"""Checkpoint / resume example.

Counterpart of the reference's save/load notebook
(``examples/save_load_model/save_load_example.ipynb``): run with periodic
checkpointing, then resume from the mid-run checkpoint and finish.

Run:  python examples/checkpoint_resume.py
"""
import tempfile

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dpmmsubclusters_tpu as dpmm


def main():
    x, gt, _, _ = dpmm.generate_gaussian_data(5_000, 4, 5, 80.0, seed=0)

    with tempfile.TemporaryDirectory() as td:
        dpmm.fit(
            x, alpha=10.0, iters=40, seed=1, verbose=False,
            enable_saving=True, model_save_interval=20,
            save_path=td + "/", save_file_prefix="checkpoint_",
        )
        print("checkpoint written at iteration 20 and 40")

        result = dpmm.run_from_checkpoint(
            f"{td}/checkpoint_20.npz", x, iters=100, verbose=False
        )
        print(f"resumed from iter 20, ran to 100: K = {result.k}, "
              f"NMI = {dpmm.nmi(gt, result.labels):.3f}")


if __name__ == "__main__":
    main()
