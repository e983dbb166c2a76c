"""T3 fine-tuning loop: sharded dp×tp train step + optax schedule + checkpoints.

The reference ships T3's training loss as dormant code (ref: t3.py:189-223)
with no runner. This example wires the full production-training shape on a
TPU mesh:

  * `build_sharded_train_step` — AdamW with linear-warmup + cosine decay and
    global-norm clipping, jitted over a (data, model) mesh; XLA inserts the
    collectives from the sharding rules in parallel/mesh.py.
  * layer-wise remat (jax.checkpoint) inside the loss for O(1-layer)
    activation memory during backward.
  * native safetensors checkpointing (convert/native_ckpt.py) with full
    resume: params, Adam moments and the schedule step all restore (the
    optimizer state is saved as an indexed .npz of its flattened leaves).

The data pipeline here is synthetic (random token batches with realistic
length distributions) so the example runs anywhere; swap `synthetic_batches`
for a real (text_tokens, speech_tokens) source to fine-tune on speech data.

Run (8 virtual CPU devices, tiny model):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/train_t3.py --dp 2 --tp 4 --steps 20 --tiny
"""
import argparse
import time
from pathlib import Path

import numpy as np


def synthetic_batches(hp, batch: int, seed: int = 0,
                      text_len: int = 48, speech_len: int = 96):
    """Yields (cond, text, text_lens, speech, speech_lens) forever."""
    import jax.numpy as jnp
    from chatterbox_tpu.models.t3 import model as t3m
    rng = np.random.default_rng(seed)
    while True:
        tl = rng.integers(text_len // 2, text_len + 1, (batch,))
        sl = rng.integers(speech_len // 2, speech_len + 1, (batch,))
        text = np.zeros((batch, text_len), np.int32)
        speech = np.zeros((batch, speech_len), np.int32)
        v_speech = hp.speech_tokens_dict_size - 2   # keep clear of start/stop
        for i in range(batch):
            text[i, : tl[i]] = rng.integers(0, hp.text_tokens_dict_size, tl[i])
            speech[i, : sl[i]] = rng.integers(0, v_speech, sl[i])
        cond = t3m.T3CondArrays(
            speaker_emb=jnp.asarray(
                rng.standard_normal((batch, 256)).astype(np.float32)),
            cond_prompt_speech_tokens=jnp.asarray(rng.integers(
                0, v_speech,
                (batch, hp.speech_cond_prompt_len)).astype(np.int32)),
            emotion_adv=jnp.asarray(0.5 * np.ones((batch, 1, 1), np.float32)),
        )
        yield (cond, jnp.asarray(text), jnp.asarray(tl.astype(np.int32)),
               jnp.asarray(speech), jnp.asarray(sl.astype(np.int32)))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dp", type=int, default=1, help="data-parallel size "
                    "(model axis gets the remaining devices)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--clip", type=float, default=1.0)
    ap.add_argument("--ckpt-dir", type=Path, default=Path("/tmp/t3_ckpt"))
    ap.add_argument("--ckpt-every", type=int, default=50)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny_test config (CI / smoke); default: turbo 350M")
    args = ap.parse_args()

    import jax
    from chatterbox_tpu.models.t3.config import T3Config
    from chatterbox_tpu.parallel.mesh import make_mesh, shard_batch
    from chatterbox_tpu.parallel.train import (TrainState,
                                               build_sharded_train_step)
    from chatterbox_tpu.convert.native_ckpt import save_pytree, load_pytree

    hp = T3Config.tiny_test("llama") if args.tiny else T3Config.turbo()
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, dp=args.dp)
    print(f"mesh: {mesh.shape} over {n_dev} devices; model: "
          f"{'tiny' if args.tiny else 'turbo'}")

    with mesh:
        step, init_state = build_sharded_train_step(
            hp, mesh, lr=args.lr, warmup_steps=args.warmup,
            total_steps=args.steps, clip_norm=args.clip)
        state = init_state(jax.random.key(0))
        batches = synthetic_batches(hp, args.batch)
        start = 0
        if args.resume and (args.ckpt_dir / "params.safetensors").exists():
            params = load_pytree(args.ckpt_dir / "params.safetensors",
                                 jax.device_get(state.params))
            new_params = jax.device_put(
                params, jax.tree_util.tree_map(lambda l: l.sharding,
                                               state.params))
            opt_state = state.opt_state
            opt_path = args.ckpt_dir / "opt_state.npz"
            if opt_path.exists():     # Adam moments + schedule count
                with np.load(opt_path) as z:
                    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
                    # leave the loaded leaves uncommitted (plain numpy) —
                    # the jitted step shards them to match the params
                    loaded = [z[str(i)] for i in range(len(leaves))]
                opt_state = jax.tree_util.tree_unflatten(treedef, loaded)
            state = TrainState(new_params, opt_state)
            start = int(np.load(args.ckpt_dir / "step.npy"))
            print(f"resumed from step {start}")
            for _ in range(start):    # realign the synthetic data stream
                next_skip = next(batches)

        t0 = time.perf_counter()
        for i in range(start, args.steps):
            cond, text, tlen, speech, slen = next(batches)
            cond = cond._replace(
                speaker_emb=shard_batch(cond.speaker_emb, mesh),
                cond_prompt_speech_tokens=shard_batch(
                    cond.cond_prompt_speech_tokens, mesh),
                emotion_adv=shard_batch(cond.emotion_adv, mesh))
            state, metrics = step(state, cond, shard_batch(text, mesh),
                                  shard_batch(tlen, mesh),
                                  shard_batch(speech, mesh),
                                  shard_batch(slen, mesh))
            if (i + 1) % 10 == 0 or i + 1 == args.steps:
                lt = float(metrics["loss_text"])
                ls = float(metrics["loss_speech"])
                dt = time.perf_counter() - t0
                print(f"step {i+1:5d}  loss_text {lt:.4f}  loss_speech {ls:.4f}"
                      f"  ({dt / (i + 1 - start):.2f} s/step)")
            if (i + 1) % args.ckpt_every == 0 or i + 1 == args.steps:
                args.ckpt_dir.mkdir(parents=True, exist_ok=True)
                save_pytree(jax.device_get(state.params),
                            args.ckpt_dir / "params.safetensors")
                leaves = jax.tree_util.tree_leaves(
                    jax.device_get(state.opt_state))
                np.savez(args.ckpt_dir / "opt_state.npz",
                         **{str(i_l): l for i_l, l in enumerate(leaves)})
                np.save(args.ckpt_dir / "step.npy", i + 1)
        print(f"done: {args.steps - start} steps")


if __name__ == "__main__":
    main()
