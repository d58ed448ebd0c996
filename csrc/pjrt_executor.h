// PJRT C-API executor — runs an exported StableHLO forward function on any
// PJRT-backed device (TPU via libtpu / the platform plugin, CPU via a CPU
// PJRT plugin). This is the production TPU path of the native inference
// client (csrc/inference_client.h): the reference's equivalent was the TF
// C++ Session over a frozen graph.pb (tf_inference.cpp:96-143); here the
// artifact is the StableHLO bytecode written by scripts/export_model.py.
#pragma once

#include <array>
#include <cstdint>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

#include "inference_client.h"

namespace vnet {

// Typed PJRT failure carrying the absl status code (PJRT_Error_Code), so
// callers can distinguish plausibly-transient failures (worth retrying)
// from deterministic contract errors (wrong buffer size, invalid dims)
// that must surface immediately.
class PjrtError : public std::runtime_error {
 public:
  PjrtError(const std::string& msg, int code)
      : std::runtime_error(msg), code_(code) {}
  int code() const { return code_; }
  // True for codes that can legitimately succeed on retry. The documented
  // transient failure on this platform is FAILED_PRECONDITION on large
  // H2D transfers; UNAVAILABLE/ABORTED/DEADLINE_EXCEEDED etc. are the
  // usual runtime-state codes. INVALID_ARGUMENT, NOT_FOUND, OUT_OF_RANGE,
  // UNIMPLEMENTED... are deterministic and never retried.
  bool transient() const {
    switch (code_) {
      case 1:   // CANCELLED
      case 2:   // UNKNOWN
      case 4:   // DEADLINE_EXCEEDED
      case 8:   // RESOURCE_EXHAUSTED
      case 9:   // FAILED_PRECONDITION
      case 10:  // ABORTED
      case 13:  // INTERNAL
      case 14:  // UNAVAILABLE
        return true;
      default:
        return false;
    }
  }

 private:
  int code_;
};

class PjrtExecutor {
 public:
  // One client create option: integer or string value.
  struct Option {
    std::string name;
    std::string str_value;
    int64_t int_value = 0;
    bool is_string = false;
  };

  // plugin_path: shared object exporting GetPjrtApi().
  // program: StableHLO MLIR bytecode (or textual MLIR).
  // options: plugin-specific PJRT_NamedValue create options.
  // Throws std::runtime_error on any PJRT failure.
  PjrtExecutor(const std::string& plugin_path, std::string program,
               std::vector<Option> options = {});
  ~PjrtExecutor();

  PjrtExecutor(const PjrtExecutor&) = delete;
  PjrtExecutor& operator=(const PjrtExecutor&) = delete;

  std::string platform_name() const;

  // Run the compiled function on one f32 input of shape `dims`; returns the
  // flattened f32 output (the exported softmax probabilities). Transient
  // PJRT failures are retried up to `max_attempts` times total.
  std::vector<float> Run(const std::vector<float>& input,
                         const std::vector<int64_t>& dims,
                         std::vector<int64_t>* out_dims = nullptr,
                         int max_attempts = 2);

  // Staged execution: StageInput enqueues the async host->device transfer
  // and returns a move-only handle; ExecuteStaged consumes the handle and
  // runs the executable on it. Staging batch i+1 before executing batch i
  // overlaps its DMA with batch i's device compute (the reference app had
  // no such overlap — it fed the TF session synchronously,
  // tf_inference.cpp:396-476). CONTRACT: `input` must stay alive and
  // unmodified until ExecuteStaged on the handle returns or the handle is
  // destroyed (PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes).
  class StagedInput {
   public:
    StagedInput();
    StagedInput(StagedInput&&) noexcept;
    StagedInput& operator=(StagedInput&&) noexcept;
    ~StagedInput();
    explicit operator bool() const;

   private:
    friend class PjrtExecutor;
    struct State;
    std::unique_ptr<State> state_;
  };

  StagedInput StageInput(const std::vector<float>& input,
                         const std::vector<int64_t>& dims);
  std::vector<float> ExecuteStaged(StagedInput staged,
                                   std::vector<int64_t>* out_dims = nullptr);

  // Adapt to the InferenceClient Executor interface: patches
  // (n, *patch, 1) -> probabilities (n, *patch, num_classes).
  // `compiled_batch`: the fixed batch dimension the StableHLO program was
  // exported with. Incoming batches are chunked to it and the final
  // partial chunk is padded (repeating the last patch) then truncated —
  // the exported executable's shape never varies. 0 = pass n through
  // unchanged (the program must accept it).
  Executor AsExecutor(int64_t compiled_batch = 0);

 private:
  std::vector<float> RunOnce(const std::vector<float>& input,
                             const std::vector<int64_t>& dims,
                             std::vector<int64_t>* out_dims);

  struct Impl;
  std::unique_ptr<Impl> impl_;
};

}  // namespace vnet
