import bench
bench._enable_compile_cache()
t8, dt8 = bench.bench_decode(4096, 11008, 32, 32, 32, batch=8, quantize=True, fuse=True)
print(f"int8 7B b8 decode: {t8:.1f} tok/s total ({dt8*1e3/128:.2f} ms/step)")
