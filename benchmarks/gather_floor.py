import time, os, numpy as np, jax, dataclasses
from volumerenderingproject_tpu import (RenderConfig, default_transfer_function, load_nifti)
from volumerenderingproject_tpu.scene.camera import Camera
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
tf = default_transfer_function()
rng = np.random.default_rng(int.from_bytes(os.urandom(4),"little"))
def cam():
    th = rng.random()*6.28; y = 0.3+0.3*rng.random()
    return Camera.initial(position=(1.5*np.cos(th), y, 1.5*np.sin(th)))
def bench(label, spr, tile, w=700):
    cfg = RenderConfig(width=w, height=w, samples_per_ray=spr)
    f = jax.jit(lambda v,t,c: render_vrc_pallas(v,t,c,cfg,early_eps=1e-3,tile=tile))
    np.asarray(f(vol, tf, cam())[0,0])
    ts=[]
    for k in range(6):
        c = cam(); t0=time.time(); np.asarray(f(vol, tf, c)[0,0]); ts.append(time.time()-t0)
    print(f"{label}: med {np.median(ts)*1e3:6.1f} ms (all: {' '.join(f'{t*1e3:.0f}' for t in ts)})")
# trivial computation floor (no pallas)
g = jax.jit(lambda c: c.position * 2.0)
np.asarray(g(cam()))
ts=[]
for k in range(6):
    c=cam(); t0=time.time(); np.asarray(g(c)); ts.append(time.time()-t0)
print(f"dispatch floor (trivial jit): med {np.median(ts)*1e3:.1f} ms")
bench("spr=4   tile=(32,16,16)", 4, (32,16,16))
bench("spr=100 tile=(32,16,16)", 100, (32,16,16))
bench("spr=250 tile=(32,16,16)", 250, (32,16,16))
bench("spr=500 tile=(32,16,16)", 500, (32,16,16))
bench("spr=500 100px tile=(32,16,16)", 500, (32,16,16), w=100)
