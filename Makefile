# Developer entry points (reference: the reference repo's Makefile wraps
# SGE qsub submissions; here the targets run locally / on the attached TPU).

PY ?= python

.PHONY: test test-full bench profile native train-smoke eval-smoke clean

profile:
	$(PY) scripts/profile_bench.py
	$(PY) scripts/batch_scaling.py

test:
	$(PY) -m pytest tests/ -q -m "not slow and not heavy"

test-full:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

native:
	$(MAKE) -C native

train-smoke:
	$(PY) -m ditsep_tpu.cli.train_diffsep --config diffsep --synthetic \
	  --workdir /tmp/ditsep_smoke --batch-size 2 --max-steps 3 \
	  --max-epochs 1 --override model.score_model.nf=16 \
	  "model.score_model.ch_mult=(1, 1)" \
	  "model.score_model.attn_resolutions=()" model.sampler.N=2

train-stable-smoke:
	printf '%s' '{"model_type": "diffusion_uncond", "sample_rate": 8000, \
	  "sample_size": 64, "model": {"type": "DAU1d", "config": \
	  {"io_channels": 2, "depth": 2, "n_attn_layers": 1, \
	  "channels": [4, 8], "strides": [2]}}, \
	  "training": {"learning_rate": 0.001}}' > /tmp/dau_smoke.json
	$(PY) -m ditsep_tpu.cli.train_stable --model-config /tmp/dau_smoke.json \
	  --workdir /tmp/stable_smoke --batch-size 2 --max-steps 5

eval-smoke:
	$(PY) -m ditsep_tpu.cli.evaluate --config diffsep --synthetic \
	  --sampler-N 2 --limit 2 --eval-batch-size 2 \
	  --override model.score_model.nf=16 \
	  "model.score_model.ch_mult=(1, 1)" \
	  "model.score_model.attn_resolutions=()"

clean:
	rm -rf native/libditsep_io.so .pytest_cache
