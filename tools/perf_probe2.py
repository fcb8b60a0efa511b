"""Characterize the sync latency: block vs fetch, compute-size dependence."""
import time, numpy, jax, jax.numpy as jnp

def p(*a): print(*a, flush=True)

f = jax.jit(lambda x: x + 1.0)
x = jnp.zeros((8, 128))
f(x).block_until_ready()

# separate: dispatch, block_until_ready, then fetch
for trial in range(4):
    t0 = time.perf_counter(); y = f(x); t1 = time.perf_counter()
    y.block_until_ready(); t2 = time.perf_counter()
    numpy.asarray(y); t3 = time.perf_counter()
    p(f"dispatch={1e3*(t1-t0):.1f}ms block={1e3*(t2-t1):.1f}ms fetch={1e3*(t3-t2):.1f}ms")

# does a bigger compute change it? 2048x2048 matmul chain
g = jax.jit(lambda a: a @ a)
a = jnp.ones((2048, 2048))
g(a).block_until_ready()
for trial in range(3):
    t0 = time.perf_counter(); y = g(a); y.block_until_ready(); t1 = time.perf_counter()
    p(f"matmul sync: {1e3*(t1-t0):.1f}ms")

# chain of 10 dispatches then ONE sync
for trial in range(3):
    t0 = time.perf_counter()
    y = x
    for _ in range(10):
        y = f(y)
    y.block_until_ready(); t1 = time.perf_counter()
    p(f"10 chained + 1 sync: {1e3*(t1-t0):.1f}ms")

# sync twice in a row on same value (2nd should be free)
y = f(x); y.block_until_ready()
t0 = time.perf_counter(); y.block_until_ready(); t1 = time.perf_counter()
p(f"re-block: {1e3*(t1-t0):.1f}ms")

# jax.device_get on a list of results dispatched together
ys = [f(jnp.zeros((8,128))+i) for i in range(5)]
t0 = time.perf_counter(); jax.device_get(ys); t1 = time.perf_counter()
p(f"device_get 5 results: {1e3*(t1-t0):.1f}ms")
