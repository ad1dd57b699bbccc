# som_lvq_pak_tpu top-level targets.
#
# The somexample/lvqexample targets replicate the reference package's
# golden demo pipelines (reference Makefile:195-212) through the somvq
# CLI; outputs land in examples/ and match the reference byte-for-byte.

PY      ?= python
CLI      = $(PY) -m som_lvq_pak_tpu.cli
DATA    ?= /root/reference
OUT     ?= examples

.PHONY: all test bench native somexample lvqexample clean

all: native

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

native:
	$(MAKE) -C native

$(OUT):
	mkdir -p $(OUT)

# randinit -> vsom coarse -> vsom fine -> qerror -> vcal -> visual
somexample: | $(OUT)
	$(CLI) randinit -din $(DATA)/ex.dat -cout $(OUT)/ex.cod \
	  -xdim 12 -ydim 8 -topol hexa -neigh bubble -rand 123
	$(CLI) vsom -din $(DATA)/ex.dat -cin $(OUT)/ex.cod \
	  -cout $(OUT)/ex.cod -rlen 1000 -alpha 0.05 -radius 10
	$(CLI) vsom -din $(DATA)/ex.dat -cin $(OUT)/ex.cod \
	  -cout $(OUT)/ex.cod -rlen 10000 -alpha 0.02 -radius 3
	$(CLI) qerror -din $(DATA)/ex.dat -cin $(OUT)/ex.cod
	$(CLI) vcal -din $(DATA)/ex_fts.dat -cin $(OUT)/ex.cod \
	  -cout $(OUT)/ex.cod
	$(CLI) visual -din $(DATA)/ex_ndy.dat -cin $(OUT)/ex.cod \
	  -dout $(OUT)/ex.nvs
	$(CLI) visual -din $(DATA)/ex_fdy.dat -cin $(OUT)/ex.cod \
	  -dout $(OUT)/ex.fvs

# eveninit -> mindist -> balance -> olvq1 -> accuracy
lvqexample: | $(OUT)
	$(CLI) eveninit -noc 200 -din $(DATA)/ex1.dat -cout $(OUT)/ex1.cod
	$(CLI) mindist -cin $(OUT)/ex1.cod
	$(CLI) balance -din $(DATA)/ex1.dat -cin $(OUT)/ex1.cod \
	  -cout $(OUT)/ex1.cod
	$(CLI) olvq1 -din $(DATA)/ex1.dat -cin $(OUT)/ex1.cod \
	  -cout $(OUT)/ex1.cod -rlen 5000
	$(CLI) accuracy -din $(DATA)/ex2.dat -cin $(OUT)/ex1.cod

clean:
	rm -rf $(OUT)
	$(MAKE) -C native clean
