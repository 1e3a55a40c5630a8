"""Device-resident batch iteration.

The reference pipes numpy samples through a torch DataLoader with a deep-copy
collator every batch (ref: libcity/data/utils.py:31-83, batch.py:43-57) and
re-uploads each batch to the device. TPU-native design: upload each split to
device HBM once, then every batch is a device-side gather of a host-permuted
index slice — no per-batch host->device copies, no Python collation.
"""

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from multistgraph_tpu.data.windows import pad_to_batch_multiple


class DeviceDataLoader:
    """Iterates dict batches {'X': (B,...), 'y': (B,...)} of device arrays."""

    def __init__(
        self,
        x: np.ndarray,
        y: np.ndarray,
        batch_size: int,
        shuffle: bool,
        pad_with_last_sample: bool = True,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        if pad_with_last_sample:
            x, y = pad_to_batch_multiple(x, y, batch_size)
        if x.shape[0] % batch_size != 0:
            # Drop the ragged tail when padding is disabled (torch's default
            # DataLoader keeps a short final batch; a short batch would force a
            # recompile under jit, so we drop it and document the deviation).
            keep = (x.shape[0] // batch_size) * batch_size
            x, y = x[:keep], y[:keep]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        device_put = (lambda a: jax.device_put(a, sharding)) if sharding is not None else jax.device_put
        self.x = device_put(jnp.asarray(x, dtype=jnp.float32))
        self.y = device_put(jnp.asarray(y, dtype=jnp.float32))
        self.num_samples = int(self.x.shape[0])
        self.num_batches = self.num_samples // batch_size

    def __len__(self) -> int:
        return self.num_batches

    def epoch_permutation(self) -> np.ndarray:
        """(num_batches, B) sample indices for one epoch, shuffled if enabled.

        Used by the executor's single-dispatch scan-over-batches epoch; calling
        it advances the shuffle RNG exactly like one __iter__ pass would.
        """
        order = np.arange(self.num_samples)
        if self.shuffle:
            self._rng.shuffle(order)
        return order[: self.num_batches * self.batch_size].reshape(self.num_batches, self.batch_size)

    def ordered_permutation(self) -> np.ndarray:
        """(num_batches, B) sample indices in dataset order (eval/test)."""
        return np.arange(self.num_batches * self.batch_size).reshape(
            self.num_batches, self.batch_size
        )

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        order = np.arange(self.num_samples)
        if self.shuffle:
            self._rng.shuffle(order)
        for i in range(self.num_batches):
            idx = jnp.asarray(order[i * self.batch_size : (i + 1) * self.batch_size])
            yield {"X": jnp.take(self.x, idx, axis=0), "y": jnp.take(self.y, idx, axis=0)}


def pad_ragged(
    sequences,
    pad_value: float = 0.0,
    max_len: Optional[int] = None,
    dtype=np.float32,
):
    """Pad variable-length sequences into one static-shape batch.

    TPU-native counterpart of the reference's BatchPAD
    (libcity/data/batch.py:70-136): pad to the batch's longest sequence
    (optionally capped at `max_len`), truncation keeps the TAIL of longer
    sequences ("time series — drop the earliest points", batch.py:128-132),
    and the pre-padding lengths are returned so downstream masking can
    ignore padded steps. Static output shapes are what jit requires; the
    lengths array plays the role of BatchPAD.get_origin_len.

    Returns (padded (B, L, ...) array, origin_len (B,) int32 array).
    """
    if not sequences:
        raise ValueError("pad_ragged needs at least one sequence")
    arrs = [np.asarray(s, dtype=dtype) for s in sequences]
    trail = arrs[0].shape[1:]
    for a in arrs:
        if a.shape[1:] != trail:
            raise ValueError("pad_ragged: trailing dims differ across sequences")
    longest = max(a.shape[0] for a in arrs)
    target = longest if max_len is None else min(max_len, longest)
    out = np.full((len(arrs), target) + trail, pad_value, dtype=dtype)
    origin_len = np.empty(len(arrs), dtype=np.int32)
    for i, a in enumerate(arrs):
        if a.shape[0] > target:
            a = a[-target:]
        out[i, : a.shape[0]] = a
        origin_len[i] = a.shape[0]
    return out, origin_len


def generate_dataloaders(
    splits,
    batch_size: int,
    pad_with_last_sample: bool = True,
    seed: int = 0,
    sharding: Optional[jax.sharding.Sharding] = None,
):
    """(train, eval, test) loaders; train/eval shuffled, test not (ref: data/utils.py:74-83)."""
    x_train, y_train, x_val, y_val, x_test, y_test = splits
    train = DeviceDataLoader(x_train, y_train, batch_size, True, pad_with_last_sample, seed, sharding)
    val = DeviceDataLoader(x_val, y_val, batch_size, True, pad_with_last_sample, seed + 1, sharding)
    test = DeviceDataLoader(x_test, y_test, batch_size, False, pad_with_last_sample, seed + 2, sharding)
    return train, val, test
