"""Image-segmentation-style example: cluster dense 5-D pixel features.

Counterpart of the reference's Sintel superpixel notebook
(``examples/image_seg/dpgmm-superpixels.ipynb``): each pixel becomes a
(x, y, L, a, b)-style feature row; the DPMM discovers segments.  Uses a
synthetic image so the example has no external data dependency.

Run:  python examples/image_segmentation.py
"""
import numpy as np

import dpmmsubclusters_tpu as dpmm


def synthetic_image(h=218, w=512):
    """A few smooth color regions + noise; returns [H*W, 5] features."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    region = (xx // (w / 4)).astype(np.int32) + 4 * (yy > h / 2)
    rng = np.random.default_rng(0)
    palette = rng.uniform(0, 255, size=(8, 3)).astype(np.float32)
    color = palette[region] + rng.normal(0, 8, size=(h, w, 3))
    feats = np.concatenate(
        [
            (xx / w * 100)[..., None],
            (yy / h * 100)[..., None],
            color,
        ],
        axis=-1,
    ).reshape(-1, 5)
    return feats.astype(np.float32), region.reshape(-1)


def main():
    feats, gt = synthetic_image()
    print(f"{len(feats):,} pixels x {feats.shape[1]} features")
    result = dpmm.fit(
        feats, alpha=10.0, iters=120, seed=1, verbose=True, k_max=64,
    )
    print(f"\nsegments found: K = {result.k} "
          f"(NMI vs regions: {dpmm.nmi(gt, result.labels):.3f})")


if __name__ == "__main__":
    main()
