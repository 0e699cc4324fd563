"""Rotated-MNIST dataset factory, loaders, and initializers (L0).

Reference: generate_rotated_MNIST (utils.py:507-657), import_rotated_mnist
(utils.py:799-875), generate_init_inducing_points (utils.py:691-744).

Dataset schema (identical to the reference pickles):
  {'images': (N, 28, 28, 1) float, 'aux_data': (N, 2 + M) float}
with aux rows [image_id, angle_radians, pca_0..pca_{M-1}].

Environment note: this image has no raw MNIST download path (zero egress),
but the reference ships `eval_data3.p` / `test_data3.p`.
`derive_base_images_from_eval` recovers the 40 unrotated base images from
the shipped eval pickle and (optionally) augments them to the full 400-image
base set so the complete N_train=4050 pipeline runs end-to-end with real
digit images; pass your own (N, 28, 28) base array to `generate_rotated_mnist`
when the original MNIST is available.
"""

from __future__ import annotations

import math
import pickle
import random
from pathlib import Path
from typing import Dict, Iterator, Optional, Tuple

import numpy as np
from scipy import ndimage, stats
from sklearn.decomposition import PCA


def derive_base_images_from_eval(eval_pickle_path: str,
                                 n_target: int = 400,
                                 seed: int = 0) -> np.ndarray:
    """Recover base (unrotated) digit images from a shipped eval pickle and
    augment to `n_target` images with small random rotations/shifts.

    The eval set holds every angle for its held-out image ids; the angle==0
    rows are the unrotated originals.  Augmentation keeps the pipeline
    honest end-to-end when raw MNIST is unavailable (documented divergence
    from the reference, which samples 400 fresh MNIST images per digit).
    """
    data = pickle.load(open(eval_pickle_path, "rb"))
    aux = data["aux_data"]
    base = data["images"][aux[:, 1] == 0.0][..., 0]  # (n_base, 28, 28)

    rng = np.random.RandomState(seed)
    out = [base]
    while sum(len(x) for x in out) < n_target:
        ang = rng.uniform(-12, 12)
        shift = rng.randint(-2, 3, size=2)
        aug = ndimage.rotate(base, ang, axes=(1, 2), reshape=False)
        aug = np.roll(aug, shift, axis=(1, 2))
        out.append(np.clip(aug, 0.0, 1.0))
    return np.concatenate(out)[:n_target]


def load_keras_mnist_npz(npz_path: str, digits: str = "3",
                         per_digit: int = 400,
                         seed: int = 0) -> np.ndarray:
    """Base images from a real MNIST archive in the exact keras layout.

    The reference generator loads raw MNIST via
    `tf.keras.datasets.mnist.load_data()` (utils.py:534-538), whose
    on-disk cache is `mnist.npz` with uint8 arrays under keys
    `x_train` (60000, 28, 28), `y_train`, `x_test`, `y_test`.  This
    loader consumes that exact file so a day-one real-data run needs
    zero code change: drop keras's `~/.keras/datasets/mnist.npz` at
    `<mnist_data_path>/mnist.npz` and the driver bootstraps from real
    digits.  Selection mirrors the reference (:541-548): `per_digit`
    train images sampled per digit with `random.seed(seed)` +
    `random.sample`, concatenated in digit-block order.

    Returns (len(digits) * per_digit, 28, 28) float in [0, 1].
    """
    import random as _random

    with np.load(npz_path) as z:
        x_train = z["x_train"]
        y_train = z["y_train"]
    assert x_train.dtype == np.uint8 and x_train.shape[1:] == (28, 28), \
        (x_train.dtype, x_train.shape)
    x_train = x_train.astype(np.float64) / 255.0

    _random.seed(seed)
    blocks = []
    for d in digits:
        x_digit = x_train[y_train == int(d)]
        print(f"Number of images with digit {d}: {len(x_digit)}")
        idx = _random.sample(list(range(x_digit.shape[0])), per_digit)
        blocks.append(x_digit[idx])
    return np.concatenate(blocks)


# seven-segment layout: (row_lo, row_hi, col_lo, col_hi) in a 28x28 frame
_SEGMENTS = {
    "A": (4, 7, 8, 20),     # top bar
    "B": (5, 14, 18, 21),   # top right
    "C": (14, 23, 18, 21),  # bottom right
    "D": (21, 24, 8, 20),   # bottom bar
    "E": (14, 23, 7, 10),   # bottom left
    "F": (5, 14, 7, 10),    # top left
    "G": (12, 15, 8, 20),   # middle bar
}
_DIGIT_SEGMENTS = {
    "0": "ABCDEF", "1": "BC", "2": "ABGED", "3": "ABGCD", "4": "FGBC",
    "5": "AFGCD", "6": "AFGECD", "7": "ABC", "8": "ABCDEFG", "9": "ABCDFG",
}


def synthetic_digit_base_images(digits: str, per_digit: int = 400,
                                seed: int = 0) -> np.ndarray:
    """Stand-in multi-digit base images: seven-segment digit glyphs with
    per-instance rotation/shift/blur/intensity augmentation.

    The environment has no raw MNIST (zero egress) and the shipped eval
    pickle contains only digit-3 images, so the reference's multi-digit
    experiments (`--dataset 36 / 13679`, utils.py:507-530,
    MNIST_experiment.py:40-43) cannot be derived from real data here.
    These glyphs give each digit CLASS a structurally distinct image
    distribution (distinct PCA object-vector embeddings), so the full
    multi-digit pipeline — id blocks, per-digit eval split, N = n*4050
    train frames, GPLVM table of n*400 object vectors — runs end-to-end.
    Swap in real MNIST base images via `generate_rotated_mnist` when
    available.

    Returns (len(digits) * per_digit, 28, 28) float in [0, 1], grouped by
    digit class in the order given (the id-block layout
    generate_rotated_mnist expects).
    """
    rng = np.random.RandomState(seed)
    out = np.empty((len(digits) * per_digit, 28, 28))
    for d_i, d in enumerate(digits):
        glyph = np.zeros((28, 28))
        for seg in _DIGIT_SEGMENTS[d]:
            r0, r1, c0, c1 = _SEGMENTS[seg]
            glyph[r0:r1, c0:c1] = 1.0
        for k in range(per_digit):
            img = glyph * rng.uniform(0.75, 1.0)
            img = ndimage.rotate(img, rng.uniform(-8, 8), reshape=False)
            img = np.roll(img, rng.randint(-1, 2, size=2), axis=(0, 1))
            img = ndimage.gaussian_filter(img, rng.uniform(0.5, 0.9))
            out[d_i * per_digit + k] = np.clip(img, 0.0, 1.0)
    return out


def generate_rotated_mnist(base_images: np.ndarray, save_path: str,
                           nr_angles: int = 16, valid_set_size: float = 0.1,
                           drop_rate: float = 0.25, digits: str = "3",
                           latent_dim_object_vector: int = 8,
                           shuffle_data: bool = True, seed: int = 0
                           ) -> Dict[str, dict]:
    """Rotated-MNIST dataset factory (reference: generate_rotated_MNIST,
    utils.py:507-657).

    base_images: (N_base, 28, 28) in [0, 1] — the images to rotate (all
    digits concatenated).  Produces train/eval/test dicts, the PCA
    object-vector init, and pickles them under `save_path` with the
    reference's file-naming scheme:
      train_data{digits}.p, eval_data{digits}.p, test_data{digits}.p,
      pca_ov_init{digits}.p  (suffix _{M} when M != 8).

    Pipeline: PCA(M) embeddings of the base images; rotate each image to
    nr_angles angles in [0, 360); aux row = [id, angle_rad, pca...]; split
    the last `valid_set_size` of each digit's ids into eval; hold out one
    random angle as the test set; drop `drop_rate` of the remaining frames.
    """
    random.seed(seed)
    py_random = random
    n_base = len(base_images)
    angles_deg = np.linspace(0, 360, nr_angles + 1)[:-1]

    M = latent_dim_object_vector
    pca = PCA(n_components=M)
    pca_emb = pca.fit_transform(base_images.reshape(n_base, -1))

    # rotate every base image to every angle
    images = np.empty((n_base, nr_angles, 28, 28), dtype=np.float64)
    for i in range(n_base):
        for j, ang in enumerate(angles_deg):
            images[i, j] = ndimage.rotate(base_images[i], ang, reshape=False)
    aux = np.empty((n_base, nr_angles, 2 + M))
    aux[:, :, 0] = np.arange(n_base)[:, None]
    aux[:, :, 1] = np.radians(angles_deg)[None, :]
    aux[:, :, 2:] = pca_emb[:, None, :]

    images = images.reshape(-1, 28, 28)[..., None]
    aux = aux.reshape(-1, 2 + M)

    # eval split: last `valid_set_size` of ids per digit block
    n_digits = len(digits)
    per_digit = n_base // n_digits
    n_keep = int(per_digit * (1 - valid_set_size))
    keep_rows, eval_rows = [], []
    for d in range(n_digits):
        lo = d * per_digit
        id_block = np.arange(lo, lo + per_digit)
        keep_ids, eval_ids = id_block[:n_keep], id_block[n_keep:]
        keep_rows.append(np.isin(aux[:, 0], keep_ids))
        eval_rows.append(np.isin(aux[:, 0], eval_ids))
    keep_mask = np.logical_or.reduce(keep_rows)
    eval_mask = np.logical_or.reduce(eval_rows)

    eval_images, eval_aux = images[eval_mask], aux[eval_mask]
    images, aux = images[keep_mask], aux[keep_mask]

    if shuffle_data:
        idx = py_random.sample(range(len(eval_images)), len(eval_images))
        eval_images, eval_aux = eval_images[idx], eval_aux[idx]

    # hold out one random angle as the test set
    test_angle = py_random.sample(list(angles_deg), 1)[0]
    test_mask = aux[:, 1] == math.radians(test_angle)
    train_images, train_aux = images[~test_mask], aux[~test_mask]
    test_images, test_aux = images[test_mask], aux[test_mask]

    # drop a fraction of frames
    def drop(imgs, a):
        n_keep_ = int(len(imgs) * (1 - drop_rate))
        if shuffle_data:
            idx = py_random.sample(range(len(imgs)), n_keep_)
        else:
            idx = list(range(n_keep_))
        return imgs[idx], a[idx]

    train_images, train_aux = drop(train_images, train_aux)
    test_images, test_aux = drop(test_images, test_aux)

    out = {
        "train": {"images": train_images, "aux_data": train_aux},
        "eval": {"images": eval_images, "aux_data": eval_aux},
        "test": {"images": test_images, "aux_data": test_aux},
        "pca_ov_init": pca_emb,
        "test_angle": test_angle,
    }

    if save_path is not None:
        path = Path(save_path)
        path.mkdir(parents=True, exist_ok=True)
        suffix = "" if M == 8 else f"_{M}"
        for split in ("train", "eval", "test"):
            with open(path / f"{split}_data{digits}{suffix}.p", "wb") as f:
                pickle.dump(out[split], f)
        with open(path / f"pca_ov_init{digits}{suffix}.p", "wb") as f:
            pickle.dump(pca_emb, f)
    return out


def load_rotated_mnist(mnist_path: str, digits: str = "3", M: int = 8,
                       N_t: Optional[int] = None,
                       global_index: bool = False,
                       seed: int = 0) -> Tuple[dict, dict, dict]:
    """Load train/eval/test dicts from pickles (reference:
    import_rotated_mnist, utils.py:799-875).

    N_t subsamples the per-image angle count (keep N_t of 15 train angles
    per image) for the data-sparsity studies.  `global_index` prepends a
    running row index to aux data (used by SVIGP).
    """
    path = Path(mnist_path)
    suffix = "" if M == 8 else f"_{M}"
    splits = {}
    for split in ("train", "eval", "test"):
        with open(path / f"{split}_data{digits}{suffix}.p", "rb") as f:
            splits[split] = pickle.load(f)

    if N_t is not None:
        rng = random.Random(seed)
        train = splits["train"]
        n_rows = len(train["aux_data"])
        mask_unit = [True] * N_t + [False] * (15 - N_t)
        mask = np.concatenate([
            rng.sample(mask_unit, 15) for _ in range(n_rows // 15)])
        mask = np.concatenate([mask, np.zeros(n_rows - len(mask), bool)])
        splits["train"] = {"images": train["images"][mask],
                           "aux_data": train["aux_data"][mask]}

    if global_index:
        for split in splits.values():
            split["aux_data"] = add_global_index(split["aux_data"])

    return splits["train"], splits["eval"], splits["test"]


def add_global_index(aux: np.ndarray) -> np.ndarray:
    """Prepend a running row-index column (reference: utils.py:842-844)."""
    return np.c_[np.arange(len(aux), dtype=aux.dtype), aux]


def batch_iterator(data: dict, batch_size: int, shuffle: bool = False,
                   seed: int = 0, drop_remainder: bool = False
                   ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Simple host-side batcher over a {'images', 'aux_data'} dict.

    The reference iterates tf.data batches in dataset order without
    shuffling; `shuffle` is provided for completeness.  The (at most one)
    tail batch has a different static shape, costing a second jit
    specialization — exact metric sums are preserved.
    """
    n = len(data["images"])
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    stop = (n // batch_size) * batch_size if drop_remainder else n
    for lo in range(0, stop, batch_size):
        idx = order[lo:lo + batch_size]
        yield data["images"][idx], data["aux_data"][idx]


def generate_init_inducing_points(train_data: dict, n: float = 5,
                                  nr_angles: int = 16, seed_init: int = 0,
                                  remove_test_angle: Optional[int] = None,
                                  use_pca: bool = False, M: int = 8,
                                  seed: int = 0) -> np.ndarray:
    """Inducing-point initializer (reference: generate_init_inducing_points,
    utils.py:691-744).

    For each of nr_angles angles sample `n` object vectors — from a gaussian
    KDE of the train PCA embeddings (use_pca) or N(0, 1.5^2) — and prepend
    [running_id, angle].  Fractional n < 1 subsamples int(n * nr_angles)
    angles with one vector each.  Accepts the loaded train dict (not a
    pickle path).
    """
    rng = random.Random(seed)
    aux = train_data["aux_data"]
    angles = np.linspace(0, 2 * np.pi, nr_angles + 1)[:-1]

    if n < 1:
        indices = rng.sample(range(nr_angles), int(n * nr_angles))
        n = 1
    else:
        indices = range(nr_angles)

    points = []
    for i in indices:
        if i == remove_test_angle:
            continue
        kde_seed = seed_init + i
        if use_pca:
            cols = []
            for pca_ax in range(2, 2 + M):
                kde = stats.gaussian_kde(aux[:, pca_ax])
                cols.append(kde.resample(int(n), seed=kde_seed))
            obj = np.concatenate(cols).T
        else:
            obj = np.random.RandomState(kde_seed).normal(
                0, 1.5, int(n) * M).reshape(int(n), M)
        points.append(np.hstack([np.full((int(n), 1), angles[i]), obj]))

    points = np.concatenate(points)
    ids = np.arange(len(points))[:, None].astype(points.dtype)
    return np.hstack([ids, points])
