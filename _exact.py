import numpy as np, jax
from volumerenderingproject_tpu import (RenderConfig, default_transfer_function, load_nifti)
from volumerenderingproject_tpu.scene.camera import Camera
from volumerenderingproject_tpu.models.raycast import render_vrc
from volumerenderingproject_tpu.ops.pallas_march import render_vrc_pallas
vol = load_nifti("/root/reference/avg152T1_LR_nifti2.nii")
tf = default_transfer_function()
for wh, spr in ((100,100),(300,300),(256,500)):
    cfg = RenderConfig(width=wh, height=wh, samples_per_ray=spr)
    for pos in ((1.2,0.5,0.9),(-0.8,0.2,-1.1)):
        cam = Camera.initial(position=pos)
        a = np.asarray(jax.jit(lambda v,t,c: render_vrc_pallas(v,t,c,cfg,early_eps=0.0))(vol,tf,cam))
        b = np.asarray(jax.jit(lambda v,t,c: render_vrc(v,t,c,cfg,mode="fast"))(vol,tf,cam))
        d = abs(a-b).max()
        print(f"{wh}px spr{spr} pos{pos}: maxdiff {d:.3e}", "OK" if d == 0.0 else ("ok-ulp" if d < 1e-6 else "MISMATCH"))
