"""xplane trace of a T3 decode loop; prints top device ops grouped by name.

Usage:  python tools/perf_trace.py [gpt2|llama]
"""
import glob, gzip, json, re, sys
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.sampling.decode import t3_generate
from chatterbox_tpu.ops.sampling import SamplerParams
from chatterbox_tpu.utils.dtypes import cast_params
from chatterbox_tpu.utils.quantize import quantize_t3_backbone, best_serving_mode

family = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
hp = T3Config.english_only() if family == "llama" else T3Config.turbo()
t3_params = cast_params(t3m.t3_init(jax.random.key(1), hp), jnp.bfloat16)
t3_params = quantize_t3_backbone(t3_params, mode=best_serving_mode(hp.backbone))
cond = t3m.T3CondArrays(
    speaker_emb=jnp.zeros((1, 256)),
    cond_prompt_speech_tokens=jnp.zeros((1, hp.speech_cond_prompt_len), jnp.int32),
    emotion_adv=0.5 * jnp.ones((1, 1, 1)) if hp.emotion_adv else None)
text = jnp.zeros((1, 32), jnp.int32)
cfg = family == "llama"
sp = SamplerParams.make(temperature=0.8, top_p=1.0 if cfg else 0.95,
                        min_p=0.05, repetition_penalty=1.2,
                        cfg_weight=0.5 if cfg else 0.0)
N = 250
def run(seed):
    res = t3_generate(t3_params, hp, cond, text, jnp.asarray(30), sp,
                      jax.random.key(seed), max_new_tokens=N,
                      top_k=0 if cfg else 1000, cfg_mode=cfg, ignore_eos=True)
    return np.asarray(res.tokens)
run(0)
tdir = f"/tmp/trace_{family}"
with jax.profiler.trace(tdir):
    run(1)
f = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
ev = json.loads(gzip.open(f).read())["traceEvents"]
names = {e["pid"]: e["args"].get("name", "?") for e in ev
         if e.get("ph") == "M" and e.get("name") == "process_name"}
g = {}
for e in ev:
    if (e.get("ph") == "X" and "dur" in e
            and names.get(e.get("pid"), "").startswith("/device:")):
        base = re.sub(r"\.\d+$", "", e["name"])
        g[base] = g.get(base, 0.0) + e["dur"]
print(f"{family}: top device ops over {N} steps")
for name, dur in sorted(g.items(), key=lambda kv: -kv[1])[:14]:
    print(f"  {dur/1e3:9.2f} ms  {dur/N:7.1f} us/step  {name[:70]}")
