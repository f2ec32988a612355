import dataclasses, time, numpy as np, jax
from volumerenderingproject_tpu import (RenderConfig, default_transfer_function, load_nifti, reset_preset)
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
tf = default_transfer_function()
cam = reset_preset()
cfg = RenderConfig(width=700, height=700, samples_per_ray=500)

def bench(tile, eps=1e-3, packed=True):
    f = jax.jit(lambda v,t,c: render_vrc_pallas(v,t,c,cfg,early_eps=eps,packed=packed,tile=tile))
    try:
        img = f(vol, tf, cam); img.block_until_ready()
    except Exception as ex:
        print(f"tile={tile}: FAIL {type(ex).__name__}: {str(ex)[:120]}")
        return None, None
    times=[]
    for k in range(4):
        cam_k = dataclasses.replace(cam, position=cam.position + 1e-6*(k+1))
        t0=time.time(); im = f(vol, tf, cam_k); im.block_until_ready(); times.append(time.time()-t0)
    dt=min(times)
    print(f"tile={tile} packed={packed}: {dt*1e3:6.1f} ms  {700*700/dt/1e6:7.2f} Mrays/s")
    return dt, np.asarray(img)

base_dt, base_img = bench((16,16,4))
for tile in [(16,16,8),(16,16,16),(16,16,32),(32,16,4),(32,16,8),(32,32,4),(32,16,16),(16,8,8),(8,16,8),(64,16,4),(32,32,8)]:
    dt, img = bench(tile)
    if img is not None and abs(img-base_img).max() > 2e-3:
        print("   ^ IMAGE MISMATCH", abs(img-base_img).max())
