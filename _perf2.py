import dataclasses, time, numpy as np, jax
from volumerenderingproject_tpu import (RenderConfig, default_transfer_function, load_nifti, render_jit, reset_preset)
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
tf = default_transfer_function()
cam = reset_preset()
cfg = RenderConfig(width=700, height=700, samples_per_ray=500, early_termination=1e-3)

img = render_jit(vol, tf, cam, cfg); np.asarray(img[0,0])
times=[]
for k in range(5):
    cam_k = dataclasses.replace(cam, position=cam.position + 1e-6*k)
    t0=time.time(); img = render_jit(vol, tf, cam_k, cfg); np.asarray(img[0,0]); times.append(time.time()-t0)
print("render_jit per-frame:", [f"{t*1e3:.1f}ms" for t in times])

# direct pallas, same camera perturbation pattern, full block
f = jax.jit(lambda v,t,c: render_vrc_pallas(v,t,c,cfg,early_eps=1e-3))
img2 = f(vol, tf, cam); img2.block_until_ready()
times=[]
for k in range(5):
    cam_k = dataclasses.replace(cam, position=cam.position + 1e-6*k)
    t0=time.time(); im = f(vol, tf, cam_k); im.block_until_ready(); times.append(time.time()-t0)
print("pallas direct per-frame:", [f"{t*1e3:.1f}ms" for t in times])
print("max abs diff:", float(abs(np.asarray(img)-np.asarray(img2)).max()))
