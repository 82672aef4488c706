import sigmod2018_tpu
import jax, jax.numpy as jnp, time, logging
logging.basicConfig(level=logging.DEBUG)
for name in logging.root.manager.loggerDict:
    if 'cache' not in name: logging.getLogger(name).setLevel(logging.WARNING)
import numpy as np
f=jax.jit(lambda x: jnp.sort(x)*3+1)
x=jnp.arange(200000, dtype=jnp.int32)
t=time.time(); f(x).block_until_ready(); print("first call", time.time()-t)
