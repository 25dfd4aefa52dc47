# Top-level convenience targets.

# Regenerate the out-of-git TFHE parity key material (151 MB:
# tfhe_brk.npy + tfhe_ksk_a.npy) so ALL 7 parity tests run from a fresh
# checkout (~40 min CPU, one-time). The dump is deterministic (SplitMix64
# stream), so in-git files are rewritten bit-identically.
parity:
	python tools/pydump/tfhe_dump.py

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

.PHONY: parity native test
