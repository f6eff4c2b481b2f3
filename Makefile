# Developer entry points (reference: the reference repo's Makefile wraps
# SGE qsub submissions; here the targets run locally / on the attached TPU).

PY ?= python

.PHONY: test test-full bench profile native train-smoke eval-smoke clean

profile:
	$(PY) scripts/profile_bench.py
	$(PY) scripts/batch_scaling.py

test:
	$(PY) -m pytest tests/ -q -m "not slow"

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

eval-smoke:
	$(PY) -m ditsep_tpu.cli.evaluate --config diffsep --synthetic \
	  --sampler-N 2 --limit 2 --eval-batch-size 2 \
	  --override model.score_model.nf=16 \
	  "model.score_model.ch_mult=(1, 1)" \
	  "model.score_model.attn_resolutions=()"

clean:
	rm -rf native/libditsep_io.so .pytest_cache
