// Standalone native inference CLI — counterpart of the reference's
// cxx/main.cxx (hardcoded paths there; argument-driven here).
//
// The built-in "threshold" executor segments by intensity threshold so the
// full native pipeline (read -> preprocess -> tiled inference -> blend ->
// restore -> write) runs end-to-end without a device; the TPU execution
// path plugs a PJRT-backed Executor into InferenceClient (csrc/README.md).

#include <chrono>
#include <cstring>
#include <iostream>
#include <string>

#include "inference_client.h"

namespace {

vnet::Executor MakeThresholdExecutor(float threshold) {
  return [threshold](const std::vector<float>& patches, int64_t n,
                     const std::array<int64_t, 3>& patch,
                     int64_t num_classes) {
    const int64_t elems = patch[0] * patch[1] * patch[2];
    std::vector<float> probs((size_t)(n * elems * num_classes), 0.0f);
    for (int64_t i = 0; i < n * elems; ++i) {
      const bool fg = patches[(size_t)i] > threshold;
      probs[(size_t)(i * num_classes)] = fg ? 0.0f : 1.0f;
      if (num_classes > 1) {
        probs[(size_t)(i * num_classes + 1)] = fg ? 1.0f : 0.0f;
      }
    }
    return probs;
  };
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: vnet_infer <input.nii[.gz]> <output.nii[.gz]> "
                 "[threshold=128] [patch=64] [stride=32] [threads=4]\n";
    return 2;
  }
  const std::string input_path = argv[1];
  const std::string output_path = argv[2];
  const float threshold = argc > 3 ? std::stof(argv[3]) : 128.0f;

  vnet::InferenceOptions opts;
  if (argc > 4) {
    const int64_t p = std::stol(argv[4]);
    opts.patch_shape = {p, p, p};
  }
  if (argc > 5) {
    const int64_t s = std::stol(argv[5]);
    opts.stride = {s, s, s};
  }
  if (argc > 6) opts.num_threads = std::stoi(argv[6]);

  const auto t0 = std::chrono::steady_clock::now();
  vnet::NiftiImage input = vnet::ReadNifti(input_path);
  vnet::InferenceClient client(opts, MakeThresholdExecutor(threshold));
  vnet::NiftiImage label = client.Run(input);
  vnet::WriteNifti(label, output_path, /*as_uint8=*/true);
  const auto dt = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0)
                      .count();
  std::cout << "inference time: " << dt << " s\n";
  return 0;
}
