"""Length bucketing for variable-length message batches.

The reference streams arbitrary-length messages byte-by-byte (reference:
source/sha512.c:118-157). In a fixed-shape batched world every distinct
padded length L is a separate XLA compilation, and a ragged batch padded to
its global maximum wastes SHA-512 blocks on every short message. The TPU
answer is to bucket by SHA-512 *block count*: all messages whose padded
stream needs nb = ceil((len + 17) / 128) blocks share one compiled graph
(padded length L = 128*nb - 17, the largest length with nb blocks), so a
ragged batch costs one compile per distinct block count — not per distinct
length — and no lane hashes more blocks than its own message needs.

Host-side utility: the ragged batch is a Python list of byte strings (or a
(padded_array, lengths) pair); grouping/scatter happens on host, the per-
bucket calls run on device.
"""

import numpy as np

from curve25519_tpu.ops.sha512 import BLOCK_LEN

__all__ = ["nblocks", "bucket_length", "bucket_indices", "apply_bucketed"]

_TAIL = 17          # 0x80 pad byte + 128-bit length field => +17 bytes


def nblocks(length):
    """SHA-512 block count for a message of `length` bytes."""
    return (int(length) + _TAIL + BLOCK_LEN - 1) // BLOCK_LEN


def bucket_length(nb):
    """The canonical padded length for an nb-block bucket (largest message
    length that still fits nb blocks, so every nb-block message fits)."""
    return BLOCK_LEN * nb - _TAIL


def bucket_indices(lengths):
    """Group message indices by block count.

    lengths: sequence of ints. Returns dict {nb: np.ndarray of indices},
    iteration order = ascending nb."""
    lengths = np.asarray(lengths, dtype=np.int64)
    nbs = (lengths + _TAIL + BLOCK_LEN - 1) // BLOCK_LEN
    out = {}
    for nb in np.unique(nbs):
        out[int(nb)] = np.nonzero(nbs == nb)[0]
    return out


def apply_bucketed(fn, msgs, *row_args):
    """Run `fn(msg_batch, lengths, *row_args_batch)` once per block-count
    bucket of a ragged message batch and scatter the results back in input
    order.

    fn: callable taking ([B, L] uint8 messages, [B] int32 lengths,
        *per-row arrays) and returning an array (or pytree of arrays) with
        leading batch axis B. Typically a jitted model function — it compiles
        once per distinct block count (bucket), not per distinct length.
    msgs: list of bytes-like objects (the ragged batch), or a tuple
        (padded_uint8_array, lengths) already on host.
    row_args: optional per-message arrays, first axis = len(msgs); each
        bucket call receives the matching rows.

    Returns the results stacked in original message order (pytree structure
    preserved)."""
    import jax

    if isinstance(msgs, tuple):
        padded, lengths = msgs
        padded = np.asarray(padded, dtype=np.uint8)
        lengths = [int(v) for v in np.asarray(lengths)]
        getrow = lambda i, n: padded[i, :n]
    else:
        lengths = [len(m) for m in msgs]
        getrow = lambda i, n: np.frombuffer(bytes(msgs[i][:n]), np.uint8)

    row_args = [np.asarray(a) for a in row_args]
    buckets = bucket_indices(lengths)

    pieces = []          # (indices, result) per bucket
    for nb, idx in buckets.items():
        L = bucket_length(nb)
        mb = np.zeros((len(idx), L), dtype=np.uint8)
        lb = np.zeros((len(idx),), dtype=np.int32)
        for row, i in enumerate(idx):
            n = lengths[i]
            mb[row, :n] = getrow(i, n)
            lb[row] = n
        args = [a[idx] for a in row_args]
        pieces.append((idx, fn(mb, lb, *args)))

    # scatter back to input order
    order = np.concatenate([p[0] for p in pieces])
    inv = np.empty(len(lengths), dtype=np.int64)
    inv[order] = np.arange(len(lengths))

    def _gather(*leaves):
        stacked = np.concatenate([np.asarray(l) for l in leaves], axis=0)
        return stacked[inv]

    first = pieces[0][1]
    flat_lists = [jax.tree_util.tree_leaves(p[1]) for p in pieces]
    treedef = jax.tree_util.tree_structure(first)
    out_leaves = [_gather(*leafs) for leafs in zip(*flat_lists)]
    return jax.tree_util.tree_unflatten(treedef, out_leaves)
