# waves_jl_tpu developer targets

.PHONY: test test-fast test-tpu bench native clean-native dryrun

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/test_core.py tests/test_operators.py tests/test_designs.py -q

test-tpu:  # hardware kernel-parity tier (serializes on the one chip)
	python -m pytest tests_tpu/ -q

bench:
	python bench.py

native:
	mkdir -p native/build
	g++ -O3 -shared -fPIC -std=c++17 native/episode_store.cpp -o native/build/libepisode_store.so

clean-native:
	rm -rf native/build

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "\
	import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun OK')"
