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
def orbit(vol, tf, cams, tile, packed=True):
    def body(carry, cam):
        img = render_vrc_pallas(vol, tf, cam, cfg, early_eps=1e-3, tile=tile, packed=packed)
        return carry + img[0, 0], None
    return jax.lax.scan(body, jnp.zeros((4,), jnp.float32), cams)[0]
def bench(tile, packed=True):
    f = jax.jit(lambda v,t,c: orbit(v,t,c,tile,packed))
    try: np.asarray(f(vol, tf, cams(4)))
    except Exception as ex:
        print(f"tile={tile}: FAIL {str(ex)[:90]}"); return
    K=32; ts=[]
    for r in range(3):
        t0=time.time(); np.asarray(f(vol, tf, cams(K))); ts.append(time.time()-t0)
    dt = np.median(ts)/K
    print(f"tile={tile} packed={packed}: {dt*1e3:6.2f} ms/frame  {700*700/dt/1e6:6.1f} Mrays/s")
for tile in [(32,16,16),(64,16,8),(64,16,16),(32,16,8),(32,32,16),(32,16,32),(64,32,8),(16,32,16)]:
    bench(tile)
bench((32,16,16), packed=False)
print("--- round 2 ---")
for tile in [(32,32,16),(32,32,32),(64,32,16),(32,64,16),(64,64,8),(32,32,64)]:
    bench(tile)
