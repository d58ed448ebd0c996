// Standalone native inference CLI — counterpart of the reference's
// cxx/main.cxx (hardcoded paths there; argument-driven here).
//
// The built-in "threshold" executor segments by intensity threshold so the
// full native pipeline (read -> preprocess -> tiled inference -> blend ->
// restore -> write) runs end-to-end without a device; the TPU execution
// path plugs a PJRT-backed Executor into InferenceClient (csrc/README.md).

#include <chrono>
#include <cstring>
#include <unistd.h>
#include <cstdlib>
#include <vector>
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

#ifdef VNET_HAVE_PJRT
#include <fstream>
#include <sstream>

#include "pjrt_executor.h"
#endif

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: vnet_infer <input.nii[.gz]> <output.nii[.gz]> "
                 "[threshold=128] [patch=64] [stride=32] [threads=4] "
                 "[pjrt_plugin.so model.stablehlo num_classes]\n";
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

  vnet::Executor executor = MakeThresholdExecutor(threshold);
#ifdef VNET_HAVE_PJRT
  std::unique_ptr<vnet::PjrtExecutor> pjrt;
  if (argc > 8) {
    std::ifstream f(argv[8], std::ios::binary);
    if (!f) {
      std::cerr << "cannot open model " << argv[8] << "\n";
      return 2;
    }
    std::ostringstream ss;
    ss << f.rdbuf();
    std::vector<vnet::PjrtExecutor::Option> options;
    const std::string plugin = argv[7];
    if (plugin.find("axon") != std::string::npos) {
      // the axon relay plugin needs its pool/session create options
      // (mirrors /root/.axon_site/axon/register/pjrt.py:161-210)
      auto i64 = [](std::string n, int64_t v) {
        vnet::PjrtExecutor::Option o; o.name = std::move(n); o.int_value = v;
        return o;
      };
      auto str = [](std::string n, std::string v) {
        vnet::PjrtExecutor::Option o; o.name = std::move(n);
        o.str_value = std::move(v); o.is_string = true;
        return o;
      };
      const char* gen = std::getenv("PALLAS_AXON_TPU_GEN");
      options = {
          i64("remote_compile", 1), i64("local_only", 0), i64("priority", 0),
          str("topology", std::string(gen ? gen : "v5e") + ":1x1x1"),
          i64("n_slices", 1),
          str("session_id", "vnet-cpp-" + std::to_string(::getpid())),
          i64("rank", 0xFFFFFFFFll),
      };
    }
    pjrt = std::make_unique<vnet::PjrtExecutor>(plugin, ss.str(), options);
    std::cout << "PJRT platform: " << pjrt->platform_name() << "\n";
    // the exported StableHLO has a fixed batch dim = opts.batch_size;
    // AsExecutor chunks/pads incoming batches to it
    executor = pjrt->AsExecutor(opts.batch_size);
    if (argc > 9) opts.num_classes = std::stol(argv[9]);
  }
#endif

  const auto t0 = std::chrono::steady_clock::now();
  vnet::NiftiImage input = vnet::ReadNifti(input_path);
  vnet::InferenceClient client(opts, executor);
  vnet::NiftiImage label = client.Run(input);
  vnet::WriteNifti(label, output_path, /*as_uint8=*/true);
  const auto dt = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0)
                      .count();
  std::cout << "inference time: " << dt << " s\n";
  return 0;
}
