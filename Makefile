# lewton_tpu check runner — the one-command conformance gate.
#
# Mirrors the reference's CI matrix (.github/workflows/lewton.yml: build +
# test across toolchains) as local targets, since this container has no CI
# service. `make check` is what every round must keep green.

PY ?= python

.PHONY: check native test vals fuzz bench tpu-check

# Full local gate: native build, pytest (forced 8-device CPU mesh),
# reference-diff on both host backends, multichip dryrun.
check: native test vals
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

native:
	$(MAKE) -C lewton_tpu/native

test: native
	$(PY) -m pytest tests/ -q

vals: native
	$(PY) tools/cmp.py vals --backend native
	$(PY) tools/cmp.py vals --backend numpy

fuzz:
	$(MAKE) -C lewton_tpu/native fuzz
	lewton_tpu/native/lt_fuzz tests/data/corpus

# On-chip gates (require the real TPU; slow first compile):
tpu-check:
	$(PY) bench.py --check
	$(PY) bench.py

bench:
	$(PY) bench.py
