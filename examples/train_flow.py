"""S3Gen flow fine-tuning loop: masked CFM loss + dp-sharded optax step.

The reference ships the flow's training methods as dormant code
(ref: models/s3gen/flow.py:86-129, flow_matching.py:147-193) with no
runner. This example wires the rebuilt TPU-native loss
(models/s3gen/flow.flow_compute_loss) to a data-parallel training loop:

  * `build_sharded_flow_train_step` — AdamW over a ("data",) mesh: params
    replicated, batch sharded; remat inside the encoder/estimator for
    training-memory headroom.
  * per-row random conditioning prefixes + classifier-free dropout exactly
    as the reference trains (what makes inference-time CFG work).
  * native safetensors checkpointing with full resume (params + Adam
    moments), same scheme as examples/train_t3.py.

The data pipeline is synthetic ((token, mel) pairs with realistic length
spreads) so the example runs anywhere; swap `synthetic_batches` for a real
paired source (S3 tokens + 24 kHz matcha mels) to fine-tune on speech.

Run (8 virtual CPU devices, tiny model):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/train_flow.py --steps 20 --tiny
"""
import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_batches(batch: int, t_tok: int, seed: int = 0):
    """Yields (token, token_len, feat, feat_len, embedding) forever."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    while True:
        tl = rng.integers(t_tok // 2, t_tok + 1, (batch,)).astype(np.int32)
        token = np.zeros((batch, t_tok), np.int32)
        for i in range(batch):
            token[i, : tl[i]] = rng.integers(0, 6561, tl[i])
        feat = rng.standard_normal((batch, 2 * t_tok, 80)).astype(np.float32)
        emb = rng.standard_normal((batch, 192)).astype(np.float32)
        yield (jnp.asarray(token), jnp.asarray(tl), jnp.asarray(feat),
               jnp.asarray(2 * tl), jnp.asarray(emb))


def real_batches(data_dir, batch: int, t_tok: int, engine, sr_expect=None):
    """Real paired data from a directory of WAVs: the native threaded loader
    (runtime/dataload.cpp) prefetches clips while the device extracts
    features — S3 tokens (16 kHz), 24 kHz matcha mels, CAMPPlus x-vector —
    exactly the triplet the reference's dormant flow trainer consumes
    (ref: flow.py:86-117). Clips are cropped to t_tok worth of audio."""
    import jax.numpy as jnp
    from chatterbox_tpu.runtime import WavLoader
    from chatterbox_tpu.audio.resample import resample
    from chatterbox_tpu.models.s3gen.model import S3_SR, S3GEN_SR

    paths = sorted(Path(data_dir).rglob("*.wav"))
    if not paths:
        raise SystemExit(f"no .wav files under {data_dir}")
    max_frames = int(t_tok / 25 * 48000) + 48000   # generous native-rate cap
    loader = WavLoader(paths, n_threads=4, max_frames=max_frames,
                       epochs=1_000_000, seed=0)
    print(f"data: {len(paths)} wavs (native loader: {loader.native})")

    def one(wav):
        wav = jnp.asarray(wav)
        sr = sr_expect or 24000
        w16 = np.asarray(resample(wav, sr, S3_SR))[: t_tok * (S3_SR // 25)]
        w24 = np.asarray(resample(wav, sr, S3GEN_SR))[: t_tok * (S3GEN_SR // 25)]
        tok, tl = engine.tokenize(w16)
        feat = np.asarray(engine._mel24(jnp.asarray(w24)[None]))
        emb = np.asarray(engine._xvector(engine.params, jnp.asarray(w16)[None],
                                         jnp.asarray([len(w16)], np.int32)))
        return tok[0], int(tl[0]), feat[0], emb[0]

    it = iter(loader)
    while True:
        token = np.zeros((batch, t_tok), np.int32)
        tlens = np.zeros((batch,), np.int32)
        feat = np.zeros((batch, 2 * t_tok, 80), np.float32)
        emb = np.zeros((batch, 192), np.float32)
        for b in range(batch):
            wav, _ = next(it)
            tk, tl, ft, em = one(wav)
            n = min(tl, t_tok)
            token[b, :n] = tk[:n]
            tlens[b] = n
            feat[b, : min(len(ft), 2 * t_tok)] = ft[: 2 * t_tok]
            emb[b] = em
        yield (jnp.asarray(token), jnp.asarray(tlens), jnp.asarray(feat),
               jnp.asarray(2 * tlens), jnp.asarray(emb))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims (CPU-fast; omit for the real S3Gen size)")
    ap.add_argument("--data", type=Path, default=None,
                    help="directory of 24 kHz WAVs — real features via the "
                         "native prefetching loader (default: synthetic)")
    ap.add_argument("--ckpt-dir", type=Path, default=Path("/tmp/flow_ckpt"))
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import jax
    # honor a user-provided JAX_PLATFORMS even on images whose
    # sitecustomize force-pins a platform via jax.config
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from jax.sharding import Mesh
    from chatterbox_tpu.models.s3gen.flow import FlowDims
    from chatterbox_tpu.parallel.train import (TrainState,
                                               build_sharded_flow_train_step)
    from chatterbox_tpu.convert.native_ckpt import save_pytree, load_pytree

    dims = FlowDims.tiny_test() if args.tiny else FlowDims()
    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev), ("data",))
    print(f"mesh: data={n_dev}  dims={'tiny' if args.tiny else 'full'}")

    step, init_state = build_sharded_flow_train_step(
        dims, mesh, lr=args.lr, warmup_steps=args.warmup,
        total_steps=args.steps, clip_norm=1.0)
    state = init_state(jax.random.key(0))

    p_path = args.ckpt_dir / "flow.safetensors"
    o_path = args.ckpt_dir / "opt.safetensors"
    if args.resume and p_path.exists():
        state = TrainState(
            jax.device_put(load_pytree(p_path, state.params)),
            jax.device_put(load_pytree(o_path, state.opt_state)))
        print(f"resumed from {args.ckpt_dir}")

    if args.data is not None:
        from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init
        from chatterbox_tpu.models.s3tok.model import S3TokenizerConfig
        tok_cfg = (S3TokenizerConfig.tiny_test() if args.tiny
                   else S3TokenizerConfig())
        engine = S3GenEngine(
            s3gen_init(jax.random.key(9), tok_cfg=tok_cfg, dims=dims),
            tok_cfg=tok_cfg, dims=dims)
        batches = real_batches(args.data, args.batch, args.tokens, engine)
    else:
        batches = synthetic_batches(args.batch, args.tokens)
    t0 = time.perf_counter()
    for i in range(args.steps):
        token, tl, feat, fl, emb = next(batches)
        state, metrics = step(state, jax.random.key(1000 + i), token, tl,
                              feat, fl, emb)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss_cfm {float(metrics['loss_cfm']):.4f}  "
                  f"({(time.perf_counter() - t0) / (i + 1):.2f} s/step)")

    args.ckpt_dir.mkdir(parents=True, exist_ok=True)
    save_pytree(state.params, p_path)
    save_pytree(state.opt_state, o_path)
    print(f"saved checkpoint to {args.ckpt_dir}")


if __name__ == "__main__":
    main()
