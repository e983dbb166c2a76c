import time
import numpy as np, jax, jax.numpy as jnp
from chatterbox_tpu.ops import sampling as S
S.apply_top_p = lambda l, p: l
S.apply_top_k = lambda l, k: l
from chatterbox_tpu.models.t3.config import T3Config
from chatterbox_tpu.models.t3 import model as t3m
from chatterbox_tpu.utils.dtypes import cast_params
from chatterbox_tpu.utils.quantize import quantize_t3_backbone
from chatterbox_tpu.sampling.batched import t3_generate_batched
from chatterbox_tpu.ops.sampling import SamplerParams

hp = T3Config.turbo()
params = quantize_t3_backbone(cast_params(t3m.t3_init(jax.random.key(0), hp), jnp.bfloat16))
B = 8
cond = t3m.T3CondArrays(jnp.zeros((B,256)), jnp.zeros((B,375), jnp.int32), None)
text = jnp.zeros((B,32), jnp.int32)
lens = jnp.full((B,), 30, jnp.int32)
N = 250
sp = SamplerParams.make(cfg_weight=0.0)
def run(seed):
    r = t3_generate_batched(params, hp, cond, text, lens, sp, jax.random.key(seed),
                            max_new_tokens=N, top_k=1000, ignore_eos=True)
    return np.asarray(r.tokens)
print("compiling no-sort batched ...")
run(100)
ts = []
for i in range(3):
    t0 = time.perf_counter(); run(i); ts.append(time.perf_counter()-t0)
t = min(ts)
print(f"NO-SORT batch={B}: {t:.3f}s -> {B*N/t:.0f} agg tok/s")
