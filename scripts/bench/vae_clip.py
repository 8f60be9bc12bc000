import time
import bench
bench._enable_compile_cache()
import jax, jax.numpy as jnp
import numpy as np
from dreamllm_tpu.models.sd import VAEConfig
from dreamllm_tpu.models.sd.vae import init_vae_params, vae_decode
from dreamllm_tpu.models.clip import CLIPVisionConfig, init_clip_vision_params, clip_vision_forward

vcfg = VAEConfig(dtype=jnp.bfloat16)  # SD-2.1 defaults
vp = jax.jit(lambda r: init_vae_params(r, vcfg))(jax.random.PRNGKey(0))
lat = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 4), jnp.bfloat16)
f = jax.jit(lambda p, z: jnp.sum(vae_decode(p, vcfg, z).astype(jnp.float32)))
print("vae out:", float(f(vp, lat)))
ts = []
for i in range(5):
    t0 = time.perf_counter(); float(f(vp, lat * (1 + i * 1e-3))); ts.append(time.perf_counter() - t0)
ts.sort(); print(f"VAE decode 64x64->512px: {ts[2]*1e3:.1f} ms")

ccfg = CLIPVisionConfig(dtype=jnp.bfloat16)  # ViT-L/14 defaults
cp = jax.jit(lambda r: init_clip_vision_params(r, ccfg))(jax.random.PRNGKey(2))
img = jax.random.uniform(jax.random.PRNGKey(3), (1, 224, 224, 3), jnp.float32)
g = jax.jit(lambda p, x: jnp.sum(clip_vision_forward(p, ccfg, x)[0].astype(jnp.float32)))
print("clip out:", float(g(cp, img)))
ts = []
for i in range(5):
    t0 = time.perf_counter(); float(g(cp, img * (1 + i * 1e-3))); ts.append(time.perf_counter() - t0)
ts.sort(); print(f"CLIP ViT-L/14 encode 224px: {ts[2]*1e3:.1f} ms")
