import time, os, numpy as np, jax, jax.numpy as jnp
from volumerenderingproject_tpu import (RenderConfig, default_transfer_function, load_nifti)
from volumerenderingproject_tpu.scene.camera import Camera
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
tf = default_transfer_function()
cfg = RenderConfig(width=700, height=700, samples_per_ray=500)
rng = np.random.default_rng(int.from_bytes(os.urandom(4),"little"))

def cams(k):
    cs = [Camera.initial(position=(1.5*np.cos(th), 0.3+0.2*np.sin(2*th), 1.5*np.sin(th)))
          for th in (rng.random(k)*6.28)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cs)

def orbit(vol, tf, cams, tile):
    def body(carry, cam):
        img = render_vrc_pallas(vol, tf, cam, cfg, early_eps=1e-3, tile=tile)
        return carry + img[0, 0], None
    out, _ = jax.lax.scan(body, jnp.zeros((4,), jnp.float32), cams)
    return out

for tile in [(32,16,16),(16,16,4)]:
    f = jax.jit(lambda v,t,c: orbit(v,t,c,tile))
    for K in (8, 64):
        cs = cams(K)
        np.asarray(f(vol, tf, cs))
        ts=[]
        for r in range(4):
            cs = cams(K)
            t0=time.time(); np.asarray(f(vol, tf, cs)); ts.append(time.time()-t0)
        print(f"tile={tile} K={K}: med {np.median(ts)*1e3:7.1f} ms total (all: {' '.join(f'{t*1e3:.0f}' for t in ts)})")
