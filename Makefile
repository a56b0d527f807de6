# Developer entry points.
.PHONY: test native bench profile schemas audit clean

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
