"""Structural parity for the dynamic-chunk training masks.

Reference: cosyvoice/utils/mask.py:161-238 (add_optional_chunk_mask) —
chunk ~ U[1, T); draws > T/2 use full context; small draws use
chunk %% 25 + 1 and, with use_dynamic_left_chunk, a random left-context
limit num_left ~ U[0, (T-1)//chunk).  The JAX rng cannot bit-match
torch.randint, so the test recovers the realized (chunk, num_left) from
each sampled mask and checks the whole mask equals the reference formula
for those values — i.e. every sample is *some* valid reference mask — and
that the sampler actually explores the space.
"""

import jax
import jax.numpy as jnp
import numpy as np

import cosy_tpu.ops.masks as M

T = 64


def reference_mask(chunk: int, num_left: int) -> np.ndarray:
    """mask.py:176-211 subsequent_chunk_mask semantics in numpy."""
    pos = np.arange(T)
    end = (pos // chunk + 1) * chunk
    allowed = pos[None, :] < end[:, None]
    if num_left >= 0:
        start = np.maximum((pos // chunk - num_left) * chunk, 0)
        allowed &= pos[None, :] >= start[:, None]
    return allowed


def sample_mask(key, use_left: bool) -> np.ndarray:
    masks = jnp.ones((1, 1, T), bool)
    out = M.add_optional_chunk_mask(
        T, masks, True, use_left, 0, 0, -1, rng=key)
    return np.asarray(out[0])


def recover_chunk_and_left(m: np.ndarray):
    """Infer (chunk, num_left) from a realized mask."""
    if m.all():
        return T, -1
    chunk = int(m[0].sum())  # row 0: allowed = [0, chunk)
    last = T - 1
    first_col = int(np.argmax(m[last]))
    if first_col == 0:
        num_left = -1  # unlimited (or large enough to reach 0)
    else:
        num_left = last // chunk - first_col // chunk
    return chunk, num_left


def test_dynamic_chunk_masks_are_valid_reference_masks():
    saw_full = saw_small = saw_limited = False
    lefts = set()
    for i in range(120):
        m = sample_mask(jax.random.PRNGKey(i), use_left=True)
        chunk, num_left = recover_chunk_and_left(m)
        assert np.array_equal(m, reference_mask(chunk, num_left)), (i, chunk, num_left)
        if chunk == T:
            saw_full = True
            assert num_left == -1  # full-context draws keep all history
        else:
            saw_small = True
            assert 1 <= chunk <= 25
            if num_left >= 0:
                saw_limited = True
                assert num_left < max((T - 1) // chunk, 1)
                lefts.add(num_left)
    assert saw_full and saw_small and saw_limited
    assert len(lefts) >= 3  # the left limit actually varies


def test_dynamic_chunk_without_left_limit_keeps_history():
    for i in range(40):
        m = sample_mask(jax.random.PRNGKey(i), use_left=False)
        chunk, num_left = recover_chunk_and_left(m)
        assert num_left == -1, (i, chunk, num_left)
        assert np.array_equal(m, reference_mask(chunk, -1))


def test_dynamic_left_never_kills_own_chunk():
    # even at num_left == 0 each row must still see its own chunk
    for i in range(40):
        m = sample_mask(jax.random.PRNGKey(i), use_left=True)
        assert m.diagonal().all()
