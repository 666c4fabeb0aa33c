"""A/B: gcd-block STFT framing vs the gather fallback it replaced.

VERDICT r2 #4 asked for the non-dividing-hop framing fix (e.g.
nperseg=256, noverlap=96 -> hop 160, gcd 32) plus an on-chip datapoint
showing the gather retired.  This probe times the stft round (frame +
window + rfft) both ways with the unrolled-chain methodology and the
istft overlap-add (block interleave vs scatter-add).

Run on the real TPU as a to-completion background script:
    nohup python benches/r4_stft_framing.py > /tmp/r4_stft.log 2>&1 &
Appends one JSON line per config to benches/results_r3.jsonl.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import webgpufft_tpu.fftapi as F
    from webgpufft_tpu.runtime.profile import unrolled_chain_time

    rng = np.random.default_rng(0)
    rows = []
    for (W, nov, n, b) in [(256, 96, 1 << 18, 4), (256, 96, 1 << 16, 16),
                           (480, 288, 1 << 18, 4)]:
        H = W - nov
        x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
        nb = (n - W) // H + 1
        total = (nb - 1) * H + W
        xp = x[:, :total]
        win = jnp.asarray(np.hanning(W).astype(np.float32))

        def run_with(framer):
            # time framing + window (the stage being A/B'd; the rfft after
            # it is identical either way) mapped back to a same-shaped
            # array for the unrolled chain
            def fn(v):
                frames = framer(v, W, H, nb) * win
                s = jnp.sum(frames, axis=(-2, -1))[..., None]
                return v + 0.0 * s
            return fn

        def gather_framer(v, W_, H_, nb_):
            idx = (np.arange(nb_)[:, None] * H_
                   + np.arange(W_)[None, :]).reshape(-1)
            out = jnp.take(v, jnp.asarray(idx.astype(np.int32)), axis=-1)
            return out.reshape(*v.shape[:-1], nb_, W_)

        t_block = unrolled_chain_time(run_with(F._frame_segments), xp,
                                      unroll=4, reps=6)
        t_gather = unrolled_chain_time(run_with(gather_framer), xp,
                                       unroll=4, reps=6)
        row = {"bench": "stft_framing", "W": W, "H": H, "n": n, "batch": b,
               "block_ms": t_block * 1e3, "gather_ms": t_gather * 1e3,
               "speedup": t_gather / max(t_block, 1e-12),
               "backend": jax.devices()[0].platform,
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("benches/results_r3.jsonl", "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
