"""MNIST idx-format dataset: parser, writer, batching.

Re-expresses the reference's C++ loader (src/utils/dataset_mnist.hh: magic
checks :20-21, /255 normalization :56, big-endian dimension words :76-83) as
a numpy pipeline feeding jax. Unlike the reference — which hands out device
tensors one batch at a time through Tensor::slice — the TPU flow keeps the
whole dataset as pinned host numpy and lets ``jnp.asarray`` do a single H2D
per batch; the hot path (normalization) is optionally offloaded to the
native C++ loader (qgemm_tpu.data.native) when built.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

IMAGE_MAGIC = 2051  # reference src/utils/dataset_mnist.hh:20
LABEL_MAGIC = 2049  # reference src/utils/dataset_mnist.hh:21


def _read_header(path: str, magic: int, n_dims: int) -> tuple:
    with open(path, "rb") as f:
        head = f.read(4 * (1 + n_dims))
        if len(head) < 4 * (1 + n_dims):
            raise ValueError(f"{path}: truncated idx header")
        words = struct.unpack(f">{1 + n_dims}i", head)
        if words[0] != magic:
            raise ValueError(
                f"{path}: bad idx magic {words[0]} (expected {magic})")
        return words[1:], f.read()


def load_idx_images(path: str, use_native: bool = True) -> np.ndarray:
    """Parse an idx3-ubyte image file -> float32 [N, rows*cols] in [0, 1].

    Normalization is /255 exactly as the reference (dataset_mnist.hh:56).
    Routes through the C++ loader when available (bit-identical output).
    """
    if use_native:
        from qgemm_tpu.data import native
        if native.available():
            return native.load_idx_images(path)
    (n, rows, cols), payload = _read_header(path, IMAGE_MAGIC, 3)
    total = n * rows * cols
    if len(payload) < total:
        raise ValueError(f"{path}: truncated idx payload")
    buf = np.frombuffer(payload, dtype=np.uint8, count=total)
    return (buf.astype(np.float32) / 255.0).reshape(n, rows * cols)


def load_idx_labels(path: str, use_native: bool = True) -> np.ndarray:
    """Parse an idx1-ubyte label file -> int32 [N]."""
    if use_native:
        from qgemm_tpu.data import native
        if native.available():
            return native.load_idx_labels(path)
    (n,), payload = _read_header(path, LABEL_MAGIC, 1)
    if len(payload) < n:
        raise ValueError(f"{path}: truncated idx payload")
    return np.frombuffer(payload, dtype=np.uint8, count=n).astype(np.int32)


def write_idx_images(path: str, images: np.ndarray) -> None:
    """Write float [N, 784] images in [0,1] as idx3-ubyte (28x28)."""
    n, d = images.shape
    rows = cols = int(round(d ** 0.5))
    assert rows * cols == d, f"non-square image dim {d}"
    data = np.clip(np.rint(images * 255.0), 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">iiii", IMAGE_MAGIC, n, rows, cols))
        f.write(data.tobytes())


def write_idx_labels(path: str, labels: np.ndarray) -> None:
    """Write int labels [N] as idx1-ubyte."""
    with open(path, "wb") as f:
        f.write(struct.pack(">ii", LABEL_MAGIC, len(labels)))
        f.write(labels.astype(np.uint8).tobytes())


_SPLIT_FILES = {
    "train": ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
    "test": ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
}


@dataclass
class MNIST:
    """In-memory dataset: ``images`` float32 [N, 784], ``targets`` int32 [N].

    Mirrors the reference MNIST struct's fields (dataset_mnist.hh:10-16,
    images [N,784] float / targets [N,1] char) with numpy host storage.
    """

    images: np.ndarray
    targets: np.ndarray

    @classmethod
    def load(cls, data_dir: str, split: str = "train") -> "MNIST":
        img_name, lbl_name = _SPLIT_FILES[split]
        img_path = os.path.join(data_dir, img_name)
        lbl_path = os.path.join(data_dir, lbl_name)
        if not os.path.exists(img_path):
            raise FileNotFoundError(img_path)
        images = load_idx_images(img_path)
        targets = load_idx_labels(lbl_path)
        assert len(images) == len(targets)
        return cls(images=images, targets=targets)

    @classmethod
    def synthetic(cls, n: int, seed: int = 0, n_classes: int = 10,
                  noise: float = 0.3) -> "MNIST":
        """Deterministic learnable synthetic stand-in (no-egress fallback):
        each class is a fixed random template plus noise. Templates come from
        a constant key so splits built with different seeds (train/test) share
        the class structure and held-out accuracy is meaningful. ``noise``
        sets the difficulty: 0.3 is near-separable (fast tests); the MNIST
        oracle protocol (scripts/mnist_oracle.py) uses a much higher level so
        accuracies land in an MNIST-like 90-97% band where a cross-framework
        parity comparison is informative rather than saturated."""
        templates = np.random.default_rng(2051).uniform(
            0, 1, size=(n_classes, 784)).astype(np.float32)
        rng = np.random.default_rng(seed)
        targets = rng.integers(0, n_classes, size=(n,)).astype(np.int32)
        eps = rng.normal(0, noise, size=(n, 784)).astype(np.float32)
        images = np.clip(templates[targets] + eps, 0, 1)
        return cls(images=images, targets=targets)

    def __len__(self) -> int:
        return len(self.images)

    def batches(self, batch_size: int, seed: int | None = None):
        """Yield shuffled (images, labels) batches; drops the ragged tail so
        every batch is the same static shape (XLA recompiles on new shapes)."""
        n = len(self)
        if seed is None:
            order = np.arange(n)
        else:
            from qgemm_tpu.data import native
            if native.available():
                order = native.shuffle_indices(n, seed=seed)
            else:
                order = np.random.default_rng(seed).permutation(n)
        for lo in range(0, n - batch_size + 1, batch_size):
            idx = order[lo:lo + batch_size]
            yield self.images[idx], self.targets[idx]
