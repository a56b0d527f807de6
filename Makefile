# Developer entry points.
.PHONY: test native bench profile perf-artifacts schemas audit clean

# Regenerate every committed docs/perf artifact from the scripts that own
# them, ON THE CURRENT MACHINE (run on the real TPU for the numbers the
# round docs cite).  Each script writes its own JSON under docs/perf/ —
# a ROUNDn.md claim of "regenerated" must correspond to a git change of
# the matching file from this target (VERDICT r4 #2: claims-vs-artifacts
# drift happened twice; this makes regeneration one command).
perf-artifacts:
	python scripts/run_all_perf.py

test:
	python -m pytest tests -q

native:
	$(MAKE) -C native

bench:
	python bench.py

profile:
	python scripts/profile_index.py --clustered
	python scripts/profile_signals.py

schemas:
	python -m dewi_tpu.schemas

audit:
	python scripts/gatekeeper_audit.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache dewi_tpu/__pycache__
