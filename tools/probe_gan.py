"""On-chip measurement: HiFiGAN adversarial train step (disc + gen turns).

The reference trains HiFT/HiFiGAN with a two-optimizer turn loop
(cosyvoice/utils/executor.py:88-144: MPD+MRD discriminators, mel/feat-match/
TPR losses).  This probe measures that full turn pair on one chip at
production scale (full HiFT topology + both discriminator families), with
the steady-state depth-k methodology (PERF.md).

Usage: python tools/probe_gan.py [B [T_mel]]
"""

import os
import sys
import time

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosy_tpu.config import ModelConfig
from cosy_tpu.models import gan as G
from cosy_tpu.models.hift import init_hift_params
from cosy_tpu.train.gan_trainer import HiFiGanTrainer


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 64  # mel frames; 64*256 = 16384 samples
    cfg = ModelConfig().hift
    print(f"devices: {jax.devices()}", file=sys.stderr)

    gen_params = init_hift_params(jax.random.PRNGKey(0), cfg)
    disc_params = G.init_discriminator_params(jax.random.PRNGKey(1))
    n_gen = sum(int(np.prod(v.shape)) for v in gen_params.values())
    n_disc = sum(int(np.prod(v.shape)) for v in disc_params.values())
    print(f"generator {n_gen/1e6:.1f}M + discriminators {n_disc/1e6:.1f}M params",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    batch = {
        "speech": jnp.asarray(rng.uniform(-0.5, 0.5, (B, T * 256)).astype(np.float32)),
        "speech_feat": jnp.asarray((rng.standard_normal((B, T, 80)) * 2 - 6)
                                   .astype(np.float32)),
        "pitch_feat": jnp.asarray(rng.uniform(100, 200, (B, T)).astype(np.float32)),
    }

    trainer = HiFiGanTrainer(cfg, gen_params, disc_params)
    trainer._build()
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))

    def turn(pd, od, pg, og):
        pd, od, _ = trainer._disc_step(pd, od, pg, k1, batch)
        pg, og, _ = trainer._gen_step(pg, og, pd, k2, batch)
        return pd, od, pg, og

    def sync(tree):
        # through the tunnel block_until_ready returns early; only a
        # device->host fetch of one element truly syncs (PERF.md)
        leaf = jax.tree.leaves(tree)[0]
        np.asarray(jax.jit(lambda x: x.reshape(-1)[:1])(leaf))

    state = (trainer.disc_params, trainer.disc_opt_state,
             trainer.gen_params, trainer.gen_opt_state)
    t0 = time.perf_counter()
    out = turn(*state)
    sync(out[2])
    print(f"compile + first turn: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    depth = 6
    ts = []
    for _ in range(3):
        s = out
        t0 = time.perf_counter()
        for _ in range(depth):
            s = turn(*s)
        sync(s[2])
        ts.append((time.perf_counter() - t0) / depth)
        out = s
    t = float(np.median(ts))
    sec_audio = B * T * 256 / 22050
    print(f"GAN turn pair (disc+gen, B{B} x {T*256} samples): {t*1e3:.1f} ms/step "
          f"steady-state ({sec_audio/t:.1f}x realtime audio throughput)")


if __name__ == "__main__":
    main()
