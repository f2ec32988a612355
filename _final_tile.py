exec(open("/root/repo/_scanbench3.py").read().split("for tile in")[0])
def bench2(tile, reps=9):
    f = jax.jit(lambda v,t,c: orbit(v,t,c,tile))
    np.asarray(f(vol, tf, cams()))
    ts=[]
    for r in range(reps):
        t0=time.time(); np.asarray(f(vol, tf, cams())); ts.append(time.time()-t0)
    dt = min(ts)/32
    print(f"tile={tile}: min {dt*1e3:6.2f} ms/frame  {700*700/dt/1e6:6.1f} Mrays/s")
for tile in [(32,32,8),(32,16,16),(32,32,16),(16,32,8),(32,16,8)]:
    bench2(tile)
