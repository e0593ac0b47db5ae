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

parity:  ## THE benchmark (BASELINE.md protocol): 2048 confusable targets, stock presets
	@for task in classification ranking crosslingual qna; do \
	  $(PY) -m sse_tpu.cli demo-data --task $$task --profile hard --out_dir rawdata-hard-$$task >/dev/null; \
	  $(PY) -m sse_tpu.cli train --task_type $$task --data_dir rawdata-hard-$$task \
	    --model_dir models-hard-$$task --steps_per_checkpoint 1000 \
	    2>/dev/null | tail -1 | sed "s/^/[hard-$$task] /"; \
	done

parity-hard: parity  ## alias (historical name)

parity-comp:  ## the ORDER-SENSITIVE benchmark: BoW-bound 0.125, bigram/Bayes ceiling 0.899 (tools/comp_oracle.py)
	@$(PY) -m sse_tpu.cli demo-data --task ranking --profile compositional --out_dir rawdata-comp >/dev/null
	@for cfg in "bow --cell bow" "gru " \
	  "best --cell lstm --num_layers 3 --residual True --learning_rate 0.003 --max_epochs 40 --dropout 0.1"; do \
	  set -- $$cfg; name=$$1; shift; \
	  $(PY) -m sse_tpu.cli train --task_type ranking --data_dir rawdata-comp \
	    --model_dir models-comp-$$name --steps_per_checkpoint 1000 $$* \
	    2>/dev/null | tail -1 | sed "s/^/[comp-$$name] /"; \
	done

capstone:  ## the 10M-doc full-stack protocol (BASELINE.md r3): gen -> train -> index -> eval-through-index -> bench. ~25 min on a v5e.
	@$(PY) -m sse_tpu.cli demo-data --profile scale --out_dir rawdata-scale \
	  --num_targets 10000000 --train_per_target 1048576
	@$(PY) -m sse_tpu.cli train --task_type ranking --network_mode shared-encoder \
	  --data_dir rawdata-scale --model_dir models-scale --max_seq_length 24 \
	  --max_epochs 2 --num_hard_negatives 0 --steps_per_checkpoint 4096 \
	  --index_dtype int8 --eval_sample_targets 131072 2>/dev/null | tail -1
	@$(PY) -m sse_tpu.cli index --model_dir models-scale --data_dir rawdata-scale | tail -2
	@$(PY) -m sse_tpu.cli eval --model_dir models-scale --data_dir rawdata-scale --use_index | tail -1
	@$(PY) -m sse_tpu.cli bench --kind query --model_dir models-scale --batch 256 | tail -1

parity-real:  ## REAL reference data (docs/real_data.md): make parity-real DATA_DIR=path/to/rawdata [TASK=classification]
	@test -f "$(DATA_DIR)/TrainPairs" || \
	  { echo "parity-real: $(DATA_DIR)/TrainPairs not found — point DATA_DIR at a directory with TrainPairs/EvalPairs/targetIDs (see docs/real_data.md)"; exit 1; }
	@test -f "$(DATA_DIR)/targetIDs" || \
	  { echo "parity-real: $(DATA_DIR)/targetIDs not found"; exit 1; }
	$(PY) -m sse_tpu.cli train --task_type $(TASK) \
	  --data_dir $(DATA_DIR) --model_dir $(MODEL_DIR) \
	  --steps_per_checkpoint 1000
	$(PY) -m sse_tpu.cli index --model_dir $(MODEL_DIR) --data_dir $(DATA_DIR) \
	  --export_tsv $(MODEL_DIR)/targetEncodingIndex.tsv
	$(PY) -m sse_tpu.cli eval --model_dir $(MODEL_DIR) --data_dir $(DATA_DIR) | tail -1

parity-easy:  ## SMOKE TEST ONLY: the r1 easy corpora — every working model saturates at recall 1.000
	@echo "[smoke] easy corpora saturate at 1.000 — this verifies plumbing, not quality (use 'make parity')"
	@for task in classification ranking crosslingual qna; do \
	  $(PY) -m sse_tpu.cli demo-data --task $$task --out_dir rawdata-$$task --num_targets 64 >/dev/null; \
	  $(PY) -m sse_tpu.cli train --task_type $$task --data_dir rawdata-$$task \
	    --model_dir models-$$task --max_epochs 15 --batch_size 64 \
	    --embed_dim 64 --hidden 64 --encoding_dim 64 --vocab_size 2000 \
	    --max_seq_length 24 --steps_per_checkpoint 1000 --learning_rate 0.03 \
	    --num_negatives 32 --num_hard_negatives 0 2>/dev/null | tail -1 | sed "s/^/[$$task] /"; \
	done
