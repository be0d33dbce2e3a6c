import sys, os; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, re
from lewton_tpu.models.decoder import compile_setup
from lewton_tpu.ops.windowing import init_window_carry
from lewton_tpu.parallel.batch import decode_chunk_batch
from lewton_tpu.testing import synthetic_frames, synthetic_headers

S, T = 256, 128
ident, setup = synthetic_headers(channels=2, bs0_exp=8, bs1_exp=11)
cs = compile_setup(ident, setup)
fr = {k: jnp.asarray(v) for k, v in synthetic_frames(cs, T=T, S=S, seed=3).items()}
carry = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape),
                     init_window_carry(cs.channels, cs.n1 // 2))
lowered = jax.jit(lambda cs_, fr_, c_: decode_chunk_batch(cs_, fr_, c_, with_i16=True)).lower(cs, fr, carry)
comp = lowered.compile()
hlo = comp.as_text()
open('/tmp/bench_opt.hlo','w').write(hlo)
print("bytes:", len(hlo))
