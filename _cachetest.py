import time, numpy as np, jax
from volumerenderingproject_tpu import (RenderConfig, default_transfer_function, load_nifti)
from volumerenderingproject_tpu.scene.camera import Camera
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
tf = default_transfer_function()
cfg = RenderConfig(width=700, height=700, samples_per_ray=500)
f = jax.jit(lambda v,t,c: render_vrc_pallas(v,t,c,cfg,early_eps=1e-3,tile=(16,16,4)))
import os
rng = np.random.default_rng(int.from_bytes(os.urandom(4),"little"))
imgs=[]
for k in range(6):
    th = rng.random()*6.28
    pos = (1.5*np.cos(th), 0.4+0.01*k, 1.5*np.sin(th))
    cam = Camera.initial(position=pos)
    t0=time.time(); im = f(vol, tf, cam); im.block_until_ready(); dt=time.time()-t0
    a=np.asarray(im); imgs.append(a)
    print(f"k={k} pos=({pos[0]:.3f},{pos[1]:.3f},{pos[2]:.3f}) {dt*1e3:7.1f} ms  mean={a.mean():.5f}")
print("pairwise maxdiff:", [float(abs(imgs[i]-imgs[i+1]).max()) for i in range(5)])
# repeat one camera to confirm cache hit speed
cam = Camera.initial(position=(1.0,0.5,1.0))
for k in range(3):
    t0=time.time(); im=f(vol,tf,cam); im.block_until_ready(); print(f"repeat {k}: {(time.time()-t0)*1e3:.1f} ms")
