# Run environment for the sensorium_tpu framework.
# Same targets as the reference Makefile (/root/reference/Makefile:12-35 —
# stop/build/run a mounted container) minus the GPU flags: TPU VMs expose
# the accelerator through /dev and the libtpu runtime, not --gpus.

NAME?=sensorium_tpu
COMMAND?=bash
OPTIONS?=

.PHONY: all
all: stop build run

.PHONY: build
build:
	docker build -t $(NAME) .

.PHONY: stop
stop:
	-docker stop $(NAME)
	-docker rm $(NAME)

.PHONY: run
run:
	docker run --rm -dit \
		--net=host \
		--ipc=host \
		--privileged \
		$(OPTIONS) \
		-v $(shell pwd):/workdir \
		--name=$(NAME) \
		$(NAME) \
		$(COMMAND)
	docker attach $(NAME)

.PHONY: attach
attach:
	docker attach $(NAME)

.PHONY: logs
logs:
	docker logs -f $(NAME)

.PHONY: exec
exec:
	docker exec -it $(OPTIONS) $(NAME) $(COMMAND)

# ---- local (non-container) developer targets ----

.PHONY: native
native:
	$(MAKE) -C native

.PHONY: test
test: native
	python -m pytest tests/ -x -q

.PHONY: lint
lint:
	python -m ruff check sensorium_tpu tests configs scripts || \
	python -m flake8 --max-line-length 119 sensorium_tpu

.PHONY: bench
bench:
	python bench.py
