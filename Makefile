# Developer entry points. The CLIs mirror the reference's public surface
# (python train.py/inference.py --config ...); these targets wrap the
# common invocations. CONFIG and CKPT are overridable:
#   make train CONFIG=configs/wildtrack_deform.yaml
CONFIG ?= configs/wildtrack.yaml
CKPT   ?= checkpoints/best
CACHE  := JAX_COMPILATION_CACHE_DIR=$(CURDIR)/.jax_cache \
          JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

.PHONY: test test-fast bench train infer eval export e2e e2e-deform overfit check-dataset native

test:            ## full suite on the virtual 8-CPU mesh (~3 min warm cache)
	$(CACHE) python -m pytest tests/ -q

test-fast:       ## skip the slow subprocess CLI tests
	$(CACHE) python -m pytest tests/ -q --ignore=tests/test_scripts.py

bench:           ## one-line JSON benchmark (TPU)
	$(CACHE) python bench.py

train:
	$(CACHE) python train.py --config $(CONFIG)

infer:
	$(CACHE) python inference.py --config $(CONFIG) --checkpoint $(CKPT) --track

eval:
	$(CACHE) python evaluate.py --config $(CONFIG) --checkpoint $(CKPT) --split all

export:          ## StableHLO serving artifact (batch 1)
	$(CACHE) python export.py --config $(CONFIG) --checkpoint $(CKPT) \
	    --out model.stablehlo --batch 1

e2e:             ## 120-frame synthetic train->evaluate, records MODA/MODP
	$(CACHE) python scripts/train_synthetic_e2e.py --fusion concat --epochs 30

e2e-deform:
	$(CACHE) python scripts/train_synthetic_e2e.py --fusion deform_attn --epochs 30

overfit:         ## quick learning-loop smoke (10 frames)
	$(CACHE) python scripts/overfit_check.py

check-dataset:
	$(CACHE) python scripts/check_dataset.py --config $(CONFIG)

native:          ## rebuild the C++ image codec (auto-built on first use)
	rm -f vsta_tpu/native/_imgcodec.so
	python -c "from vsta_tpu import native; print('codec built' if native.available() else 'codec unavailable (PIL fallback)')"
