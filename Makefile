# Demo orchestration — reference-parity entry points (SURVEY.md §2.1
# Makefile row: `make train` runs the classification demo end-to-end).
# The reference downloaded demo data from eBay hosting; data here is
# generated synthetically with the same TrainPairs/EvalPairs/targetIDs
# schema (SURVEY.md §6 fallback protocol).

PY ?= python
DATA_DIR ?= rawdata-classification
MODEL_DIR ?= models-classification
TASK ?= classification

.PHONY: train index eval serve demo-data test bench clean

demo-data:
	$(PY) -m sse_tpu.cli demo-data --task $(TASK) --out_dir $(DATA_DIR)

train: demo-data
	$(PY) -m sse_tpu.cli train --task_type $(TASK) \
	  --data_dir $(DATA_DIR) --model_dir $(MODEL_DIR) \
	  --max_epochs 10 --steps_per_checkpoint 50

index:
	$(PY) -m sse_tpu.cli index --model_dir $(MODEL_DIR) --data_dir $(DATA_DIR) \
	  --export_tsv $(MODEL_DIR)/targetEncodingIndex.tsv

eval:
	$(PY) -m sse_tpu.cli eval --model_dir $(MODEL_DIR) --data_dir $(DATA_DIR)

serve:
	$(PY) -m sse_tpu.cli serve --model_dir $(MODEL_DIR) --port 8080

bench:
	$(PY) bench.py

test:
	$(PY) -m pytest tests/ -x -q

clean:
	rm -rf rawdata-* models-*
