# Top-level convenience targets.

# Regenerate the out-of-git parity key material so ALL parity tests run
# from a fresh checkout (one-time): TFHE keys (151 MB, ~40 min CPU) and
# the multi-key FHEW brk transcripts (3 x 14.7 MB, ~8 min CPU). The dumps
# are deterministic (SplitMix64 streams), so in-git files are rewritten
# bit-identically.
parity:
	python tools/pydump/tfhe_dump.py
	python tools/pydump/fhew_mk_dump.py

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

.PHONY: parity native test
