# Developer entry points (reference: /root/reference/Makefile).

.PHONY: test test-fast test-par format lint bench cpu-ratio serve-demo train-debug tb ci

test:  ## full suite on the virtual 8-device CPU mesh
	python -m pytest tests/ -q

test-fast:  ## skip the slow compile-heavy suites
	python -m pytest tests/ -q --ignore=tests/test_e2e.py \
		--ignore=tests/test_train_step.py --ignore=tests/test_parallel.py

test-par:  ## sharded suite for multi-core hosts (pytest-xdist)
	python -m pytest tests/ -q -n auto --dist loadfile

format:
	python -m black dcvgan_tpu tests tools 2>/dev/null || true
	python -m isort dcvgan_tpu tests tools 2>/dev/null || true

lint:  ## static gate: syntax, undefined names, unused imports, annotations
	python tools/static_check.py

bench:  ## one-line JSON throughput benchmark
	python bench.py

cpu-ratio:  ## controlled same-host torch-vs-jax step-rate ratio (BASELINE.md)
	python tools/bench_reference_cpu.py

serve-demo:  ## sustained serving loop against a local demo run
	python -m dcvgan_tpu.cli.serve result/synthetic/demo-synthetic-depth -1 \
		--batchsize 256 --iters-per-chunk 4 --chunks 8 --sink null

train-debug:  ## CPU-runnable end-to-end slice on the mock dataset
	python -m dcvgan_tpu.cli.train --config configs/debug-mock-depth.yml

tb:  ## tensorboard over the default result dir
	tensorboard --logdir result/

ci: lint test
