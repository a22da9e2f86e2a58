# Convenience targets. The test suite itself is plain pytest; these wrap
# the environment-gated flows that need services or non-default env.

.PHONY: test bench verify postgres-up postgres-live-test postgres-down

test:
	python -m pytest tests/ -q

bench:
	python bench.py

verify:
	python tools/verify_driver.py --all

# --- Live-Postgres gate (r6 VERDICT #9; deploy/README.md) --------------
# Requires a Docker daemon. The gate test drops/recreates both reference
# tables, so it must point at a SCRATCH database — the compose file
# provisions exactly that.

postgres-up:
	docker compose -f deploy/docker-compose.postgres-test.yml up -d --wait

postgres-live-test:
	POSTGRES_DSN=jdbc:postgresql://localhost:5432/machines_test \
	POSTGRES_USER=postgres POSTGRES_PASSWORD=postgres \
	python -m pytest tests/test_postgres_live.py -q

postgres-down:
	docker compose -f deploy/docker-compose.postgres-test.yml down -v
