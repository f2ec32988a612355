import time, jax, jax.numpy as jnp
from volumerenderingproject_tpu import (RenderConfig, default_transfer_function, load_nifti, reset_preset)
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
tf = default_transfer_function()
cam = reset_preset()
cfg = RenderConfig(width=700, height=700, samples_per_ray=500)

for packed in (True, False):
    for eps in (1e-3, 0.0):
        f = jax.jit(lambda v,t,c: render_vrc_pallas(v,t,c,cfg,early_eps=eps,packed=packed))
        img = f(vol, tf, cam); img.block_until_ready()
        n, t0 = 5, time.perf_counter()
        for _ in range(n):
            img = f(vol, tf, cam)
        img.block_until_ready()
        dt = (time.perf_counter()-t0)/n
        print(f"packed={packed} eps={eps}: {dt*1e3:.2f} ms/frame, {700*700/dt/1e6:.2f} Mrays/s")
