"""Nano-on-CPU scaling runbook: decode throughput vs core count.

The reference's published Nano number is 3x realtime on EIGHT CPU cores
(ref: README.md:32,45). This image exposes ONE core (os.cpu_count() == 1),
so the parallel fraction cannot be bounded here — bench.py records the
1-core point (its per-core-scaled target). Run THIS tool on a multi-core
host to get the scaling curve:

    python tools/nano_cpu_scaling.py --cores 1 2 4 8

Each measurement runs in a fresh child process pinned to N cores with
os.sched_setaffinity BEFORE jax/XLA initialize, so the XLA:CPU thread pools
size themselves to the restricted set. Prints one JSON line per point:
{"cores": N, "nano_cpu_xrt": X, "decode_tok_s": Y}.

The kernel-level pin also bounds OpenMP/Eigen pools that ignore
hardware_concurrency overrides; if xrt stops scaling well below the
reference's 3x at 8 cores, the honest conclusion is that XLA:CPU's
intra-op parallelism on this model is the gap (recorded lever: oneDNN
XLA:CPU rewrites — DESIGN.md).
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(n_cores: int) -> None:
    os.sched_setaffinity(0, set(range(n_cores)))
    sys.path.insert(0, REPO)
    import time
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu"
    from chatterbox_tpu.models.t3.config import T3Config
    from chatterbox_tpu.models.t3 import model as t3m
    from chatterbox_tpu.sampling.decode import t3_generate
    from chatterbox_tpu.ops.sampling import SamplerParams
    from chatterbox_tpu.models.s3gen.model import S3GenEngine, s3gen_init, RefDict

    hp = T3Config.nano()
    k1, k2 = jax.random.split(jax.random.key(0))
    t3_params = t3m.t3_init(k1, hp)                  # f32: fastest on XLA:CPU
    engine = S3GenEngine(s3gen_init(k2, meanflow=True), meanflow=True)
    cond = t3m.T3CondArrays(
        speaker_emb=jnp.zeros((1, 256)),
        cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len),
                                            jnp.int32),
        emotion_adv=None)
    rng = np.random.default_rng(0)
    P = 125
    ref = RefDict(
        prompt_token=rng.integers(0, 6561, (1, P)).astype(np.int32),
        prompt_token_len=np.asarray([P], np.int32),
        prompt_feat=rng.standard_normal((1, 2 * P, 80)).astype(np.float32) * .1,
        embedding=rng.standard_normal((1, 192)).astype(np.float32))
    text = jnp.zeros((1, 32), jnp.int32)
    sp = SamplerParams.make(temperature=0.8, top_p=0.95,
                            repetition_penalty=1.2, cfg_weight=0.0)
    N = 125

    def step(seed):
        t0 = time.perf_counter()
        res = t3_generate(t3_params, hp, cond, text, jnp.asarray(30), sp,
                          jax.random.key(seed), max_new_tokens=N,
                          top_k=1000, cfg_mode=False, ignore_eos=True)
        n = int(res.n_tokens)
        t_dec = time.perf_counter() - t0
        wav, n_gen = engine.inference_from_decode(
            res.tokens, n, ref, jax.random.key(seed + 1000),
            cfg_slice=False, append_sil=0, vocab=hp.speech_tokens_dict_size)
        assert np.isfinite(wav).all()
        return time.perf_counter() - t0, t_dec, n_gen

    step(0)                                          # compile
    runs = [step(i + 1) for i in range(2)]
    wall = min(r[0] for r in runs)
    t_dec = min(r[1] for r in runs)
    xrt = (runs[-1][2] / 25.0) / wall
    print(json.dumps({"cores": n_cores,
                      "nano_cpu_xrt": round(xrt, 3),
                      "decode_tok_s": round(N / t_dec, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()
    avail = os.cpu_count() or 1
    for n in args.cores:
        if n > avail:
            print(json.dumps({"cores": n,
                              "skipped": f"host has {avail} core(s) — "
                                         f"needs a multi-core host"}))
            continue
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(n)],
            env=dict(os.environ, JAX_PLATFORMS="cpu"),
            capture_output=True, text=True, timeout=1800)
        sys.stderr.write(out.stderr[-800:])
        print(out.stdout.strip().splitlines()[-1] if out.stdout.strip()
              else json.dumps({"cores": n, "error": out.returncode}))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        main()
