# Native components (reference: csrc/ CMake superbuild — here a minimal
# host-side library set; the TPU compute path is Pallas/XLA, not C++).
CXX ?= g++
CXXFLAGS ?= -O2 -std=c++17 -fPIC -Wall
BUILD := build

all: $(BUILD)/libshm_ring.so

$(BUILD)/libshm_ring.so: csrc/shm_ring.cpp
	mkdir -p $(BUILD)
	$(CXX) $(CXXFLAGS) -shared -o $@ $< -lrt

clean:
	rm -rf $(BUILD)

.PHONY: all clean
