import time, os, numpy as np, jax
from volumerenderingproject_tpu import (RenderConfig, default_transfer_function, load_nifti)
from volumerenderingproject_tpu.scene.camera import Camera
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
tf = default_transfer_function()
cfg = RenderConfig(width=700, height=700, samples_per_ray=500)
rng = np.random.default_rng(int.from_bytes(os.urandom(4),"little"))
def cam():
    th = rng.random()*6.28; y = 0.3+0.3*rng.random()
    return Camera.initial(position=(1.5*np.cos(th), y, 1.5*np.sin(th)))
def bench(tile, eps=1e-3, packed=True):
    f = jax.jit(lambda v,t,c: render_vrc_pallas(v,t,c,cfg,early_eps=eps,packed=packed,tile=tile))
    try:
        np.asarray(f(vol, tf, cam())[0,0])
    except Exception as ex:
        print(f"tile={tile}: FAIL {type(ex).__name__}: {str(ex)[:100]}"); return
    ts=[]
    for k in range(6):
        c = cam(); t0=time.time(); np.asarray(f(vol, tf, c)[0,0]); ts.append(time.time()-t0)
    dt=np.median(ts)
    print(f"tile={tile} packed={packed} eps={eps}: med {dt*1e3:6.1f} ms  {700*700/dt/1e6:7.2f} Mrays/s   (all: {' '.join(f'{t*1e3:.0f}' for t in ts)})")
for tile in [(16,16,4),(16,16,16),(32,16,8),(32,16,16),(32,32,8),(32,32,16),(16,16,8),(32,16,32)]:
    bench(tile)
