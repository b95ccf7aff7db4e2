"""Samplers: the top_k-reduced nucleus head must implement exactly the
reference inclusion rule (common.py:119-135) that the previous full-argsort
formulation computed."""

import numpy as np
import jax
import jax.numpy as jnp

from cosy_tpu.ops.sampling import nucleus_sample, ras_sample


def _reference_kept(logits, top_p, top_k):
    """Reference inclusion rule via full stable descending argsort."""
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits, jnp.float32)))
    order = np.argsort(-probs, kind="stable")
    sp = probs[order]
    cum_before = np.cumsum(sp) - sp
    keep = (cum_before < top_p) & (np.arange(len(probs)) < top_k)
    return {int(order[i]): float(sp[i]) for i in range(len(probs)) if keep[i]}


def test_nucleus_candidates_match_reference_rule():
    rng = np.random.default_rng(0)
    for trial in range(5):
        logits = rng.standard_normal(257).astype(np.float32) * 3
        kept_ref = _reference_kept(logits, 0.8, 25)
        # empirical: every sampled token must be in the reference kept set
        seen = set()
        for s in range(64):
            tok = int(nucleus_sample(jax.random.PRNGKey(trial * 64 + s),
                                     jnp.asarray(logits)))
            seen.add(tok)
        assert seen <= set(kept_ref), (seen - set(kept_ref), kept_ref)
        # the most-probable token must be reachable
        assert max(kept_ref, key=kept_ref.get) in seen


def test_nucleus_tie_handling_prefers_lower_index():
    # two exactly-equal max logits: stable argsort (the reference) puts the
    # lower index first; with top_p tiny only that one survives
    logits = jnp.zeros((16,)).at[3].set(5.0).at[7].set(5.0)
    toks = {int(nucleus_sample(jax.random.PRNGKey(i), logits, top_p=0.1))
            for i in range(32)}
    assert toks == {3}


def test_ras_fallback_on_repetition():
    logits = jnp.zeros((32,)).at[4].set(50.0)  # near-deterministic head
    decoded = jnp.full((64,), 4, jnp.int32)  # history saturated with token 4
    n = jnp.asarray(10)
    # rep count >= win_size * tau_r -> falls back to full-distribution sample
    # (still likely 4, but the branch must execute without error)
    tok = ras_sample(jax.random.PRNGKey(0), logits, decoded, n)
    assert 0 <= int(tok) < 32
