install: ## [Local development] Upgrade pip, install the package editable.
	python -m pip install -U pip
	python -m pip install -e .

install-test: ## [Local development] Install test extras.
	python -m pip install -e '.[test]'

test: ## Full suite (CPU; forces an 8-device host mesh via tests/conftest.py).
	python -m pytest -x -q tests

test-quick: ## The ~2-minute gate tier.
	python -m pytest -x -q -m quick tests

bench: ## One-line flagship benchmark on the current accelerator.
	python bench.py
