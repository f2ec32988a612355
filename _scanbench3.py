import time, os, numpy as np, jax, jax.numpy as jnp
from volumerenderingproject_tpu import (RenderConfig, default_transfer_function, load_nifti)
from volumerenderingproject_tpu.scene.camera import Camera
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
tf = default_transfer_function()
cfg = RenderConfig(width=700, height=700, samples_per_ray=500)
# fixed orbit, but jitter slightly per *call* to defeat any value caching
base = np.linspace(0, 2*np.pi, 33)[:32]
rng = np.random.default_rng(int.from_bytes(os.urandom(4),"little"))
def cams():
    js = rng.random(32)*1e-4
    cs = [Camera.initial(position=(1.5*np.cos(th+j), 0.4+0.2*np.sin(2*th), 1.5*np.sin(th+j)))
          for th, j in zip(base, js)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cs)
def orbit(vol, tf, cams, tile):
    def body(carry, cam):
        img = render_vrc_pallas(vol, tf, cam, cfg, early_eps=1e-3, tile=tile)
        return carry + img[0, 0], None
    return jax.lax.scan(body, jnp.zeros((4,), jnp.float32), cams)[0]
def bench(tile):
    f = jax.jit(lambda v,t,c: orbit(v,t,c,tile))
    np.asarray(f(vol, tf, cams()))
    ts=[]
    for r in range(5):
        t0=time.time(); np.asarray(f(vol, tf, cams())); ts.append(time.time()-t0)
    dt = min(ts)/32
    print(f"tile={tile}: {dt*1e3:6.2f} ms/frame  {700*700/dt/1e6:6.1f} Mrays/s  (totals: {' '.join(f'{t*1e3:.0f}' for t in ts)})")
for tile in [(16,16,4),(32,16,16),(32,32,16),(64,64,8),(64,32,8),(32,32,8)]:
    bench(tile)
