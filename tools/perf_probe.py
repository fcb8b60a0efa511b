"""Measure axon-tunnel dispatch latency + pair-stage breakdown (run on TPU)."""
import time, sys, numpy, os
import jax, jax.numpy as jnp

def p(*a):
    print(*a, flush=True)

p("backend:", jax.default_backend())

# 1) raw dispatch latency: tiny jitted fn, N sequential dispatch+sync
f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128))
f(x).block_until_ready()
t0 = time.perf_counter()
N = 20
for _ in range(N):
    y = f(x)
    numpy.asarray(y)  # host sync via fetch
p(f"dispatch+fetch sync: {(time.perf_counter()-t0)/N*1000:.1f} ms/op")

t0 = time.perf_counter()
for _ in range(N):
    y = f(y)
y.block_until_ready()
p(f"async chained dispatch: {(time.perf_counter()-t0)/N*1000:.1f} ms/op")

# 2) medium transfer: 1 MB each way
big = numpy.zeros((256, 1024), numpy.float32)
t0 = time.perf_counter()
for _ in range(5):
    d = jnp.asarray(big)
    d.block_until_ready()
p(f"h2d 1MB: {(time.perf_counter()-t0)/5*1000:.1f} ms")
t0 = time.perf_counter()
for _ in range(5):
    numpy.asarray(d)
p(f"d2h 1MB: {(time.perf_counter()-t0)/5*1000:.1f} ms")
