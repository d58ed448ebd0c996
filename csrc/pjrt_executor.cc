#include "pjrt_executor.h"

#include <dlfcn.h>

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <stdexcept>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace vnet {
namespace {

std::string ErrorMessage(const PJRT_Api* api, PJRT_Error* error) {
  PJRT_Error_Message_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  args.error = error;
  api->PJRT_Error_Message(&args);
  std::string message(args.message, args.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = error;
  api->PJRT_Error_Destroy(&dargs);
  return message;
}

int ErrorCode(const PJRT_Api* api, PJRT_Error* error) {
  if (api->PJRT_Error_GetCode == nullptr) {
    return 2;  // UNKNOWN — old plugins without GetCode stay retryable
  }
  PJRT_Error_GetCode_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Error_GetCode_Args_STRUCT_SIZE;
  args.error = error;
  PJRT_Error* err = api->PJRT_Error_GetCode(&args);
  if (err != nullptr) {
    PJRT_Error_Destroy_Args dargs;
    std::memset(&dargs, 0, sizeof(dargs));
    dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
    dargs.error = err;
    api->PJRT_Error_Destroy(&dargs);
    return 2;
  }
  return static_cast<int>(args.code);
}

void Check(const PJRT_Api* api, PJRT_Error* error, const char* what) {
  if (error != nullptr) {
    // read the code first: ErrorMessage destroys the error object
    int code = ErrorCode(api, error);
    throw PjrtError(std::string(what) + ": " + ErrorMessage(api, error),
                    code);
  }
}

void AwaitEvent(const PJRT_Api* api, PJRT_Event* event, const char* what) {
  PJRT_Event_Await_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  args.event = event;
  PJRT_Error* err = api->PJRT_Event_Await(&args);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = event;
  api->PJRT_Event_Destroy(&dargs);
  Check(api, err, what);
}

// Minimal serialized xla.CompileOptionsProto:
//   executable_build_options { num_replicas: 1  num_partitions: 1 }
// (field 3 = executable_build_options; inner fields 4/5 varint 1)
const unsigned char kCompileOptions[] = {0x1A, 0x04, 0x20, 0x01, 0x28, 0x01};

}  // namespace

struct PjrtExecutor::Impl {
  void* handle = nullptr;
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;
  PJRT_LoadedExecutable* executable = nullptr;
  std::string program;  // keep code alive

  ~Impl() {
    if (api != nullptr) {
      if (executable != nullptr) {
        PJRT_LoadedExecutable_Destroy_Args args;
        std::memset(&args, 0, sizeof(args));
        args.struct_size = PJRT_LoadedExecutable_Destroy_Args_STRUCT_SIZE;
        args.executable = executable;
        api->PJRT_LoadedExecutable_Destroy(&args);
      }
      if (client != nullptr) {
        PJRT_Client_Destroy_Args args;
        std::memset(&args, 0, sizeof(args));
        args.struct_size = PJRT_Client_Destroy_Args_STRUCT_SIZE;
        args.client = client;
        api->PJRT_Client_Destroy(&args);
      }
    }
    if (handle != nullptr) dlclose(handle);
  }
};

PjrtExecutor::PjrtExecutor(const std::string& plugin_path, std::string program,
                           std::vector<Option> options)
    : impl_(new Impl) {
  impl_->program = std::move(program);
  impl_->handle = dlopen(plugin_path.c_str(), RTLD_NOW | RTLD_LOCAL);
  if (impl_->handle == nullptr) {
    throw std::runtime_error("dlopen failed: " + std::string(dlerror()));
  }
  using GetPjrtApiFn = const PJRT_Api* (*)();
  auto get_api = reinterpret_cast<GetPjrtApiFn>(
      dlsym(impl_->handle, "GetPjrtApi"));
  if (get_api == nullptr) {
    throw std::runtime_error(plugin_path + " does not export GetPjrtApi");
  }
  const PJRT_Api* api = impl_->api = get_api();

  PJRT_Plugin_Initialize_Args init;
  std::memset(&init, 0, sizeof(init));
  init.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
  Check(api, api->PJRT_Plugin_Initialize(&init), "PJRT_Plugin_Initialize");

  std::vector<PJRT_NamedValue> named;
  named.reserve(options.size());
  for (const auto& opt : options) {
    PJRT_NamedValue nv;
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    nv.name = opt.name.c_str();
    nv.name_size = opt.name.size();
    if (opt.is_string) {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = opt.str_value.c_str();
      nv.value_size = opt.str_value.size();
    } else {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = opt.int_value;
      nv.value_size = 1;
    }
    named.push_back(nv);
  }

  PJRT_Client_Create_Args create;
  std::memset(&create, 0, sizeof(create));
  create.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  create.create_options = named.empty() ? nullptr : named.data();
  create.num_options = named.size();
  Check(api, api->PJRT_Client_Create(&create), "PJRT_Client_Create");
  impl_->client = create.client;

  PJRT_Client_AddressableDevices_Args devs;
  std::memset(&devs, 0, sizeof(devs));
  devs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  devs.client = impl_->client;
  Check(api, api->PJRT_Client_AddressableDevices(&devs),
        "PJRT_Client_AddressableDevices");
  if (devs.num_addressable_devices == 0) {
    throw std::runtime_error("no addressable PJRT devices");
  }
  impl_->device = devs.addressable_devices[0];

  PJRT_Program prog;
  std::memset(&prog, 0, sizeof(prog));
  prog.struct_size = PJRT_Program_STRUCT_SIZE;
  prog.code = impl_->program.data();
  prog.code_size = impl_->program.size();
  static const char kFormat[] = "mlir";
  prog.format = kFormat;
  prog.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args compile;
  std::memset(&compile, 0, sizeof(compile));
  compile.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  compile.client = impl_->client;
  compile.program = &prog;
  compile.compile_options = reinterpret_cast<const char*>(kCompileOptions);
  compile.compile_options_size = sizeof(kCompileOptions);
  Check(api, api->PJRT_Client_Compile(&compile), "PJRT_Client_Compile");
  impl_->executable = compile.executable;
}

PjrtExecutor::~PjrtExecutor() = default;

std::string PjrtExecutor::platform_name() const {
  PJRT_Client_PlatformName_Args args;
  std::memset(&args, 0, sizeof(args));
  args.struct_size = PJRT_Client_PlatformName_Args_STRUCT_SIZE;
  args.client = impl_->client;
  Check(impl_->api, impl_->api->PJRT_Client_PlatformName(&args),
        "PJRT_Client_PlatformName");
  return std::string(args.platform_name, args.platform_name_size);
}

namespace {

// Destroys a PJRT buffer when leaving scope (exception-safe cleanup).
class BufferGuard {
 public:
  BufferGuard(const PJRT_Api* api, PJRT_Buffer* buffer)
      : api_(api), buffer_(buffer) {}
  ~BufferGuard() {
    if (buffer_ == nullptr) return;
    PJRT_Buffer_Destroy_Args args;
    std::memset(&args, 0, sizeof(args));
    args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    args.buffer = buffer_;
    api_->PJRT_Buffer_Destroy(&args);
  }
  BufferGuard(const BufferGuard&) = delete;
  BufferGuard& operator=(const BufferGuard&) = delete;

 private:
  const PJRT_Api* api_;
  PJRT_Buffer* buffer_;
};

}  // namespace

std::vector<float> PjrtExecutor::Run(const std::vector<float>& input,
                                     const std::vector<int64_t>& dims,
                                     std::vector<int64_t>* out_dims,
                                     int max_attempts) {
  for (int attempt = 1;; ++attempt) {
    try {
      return RunOnce(input, dims, out_dims);
    } catch (const PjrtError& e) {
      // retry only plausibly-transient PJRT failures; deterministic
      // contract errors (and non-PJRT exceptions) propagate immediately
      // so the first diagnostic is not buried behind retry noise
      if (!e.transient() || attempt >= max_attempts) throw;
      std::fprintf(stderr,
                   "PjrtExecutor: attempt %d/%d failed (%s); retrying\n",
                   attempt, max_attempts, e.what());
    }
  }
}

struct PjrtExecutor::StagedInput::State {
  const PJRT_Api* api = nullptr;
  PJRT_Buffer* buffer = nullptr;     // device buffer, owned
  PJRT_Event* host_done = nullptr;   // transfer-complete event, owned

  ~State() {
    if (host_done != nullptr) {
      // Honor the host-buffer contract even on abandonment: the caller may
      // free its input right after the handle dies.
      PJRT_Event_Await_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
      args.event = host_done;
      PJRT_Error* err = api->PJRT_Event_Await(&args);
      if (err != nullptr) {
        PJRT_Error_Destroy_Args dargs;
        std::memset(&dargs, 0, sizeof(dargs));
        dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
        dargs.error = err;
        api->PJRT_Error_Destroy(&dargs);
      }
      PJRT_Event_Destroy_Args eargs;
      std::memset(&eargs, 0, sizeof(eargs));
      eargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
      eargs.event = host_done;
      api->PJRT_Event_Destroy(&eargs);
    }
    if (buffer != nullptr) {
      PJRT_Buffer_Destroy_Args args;
      std::memset(&args, 0, sizeof(args));
      args.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      args.buffer = buffer;
      api->PJRT_Buffer_Destroy(&args);
    }
  }
};

PjrtExecutor::StagedInput::StagedInput() = default;
PjrtExecutor::StagedInput::StagedInput(StagedInput&&) noexcept = default;
PjrtExecutor::StagedInput& PjrtExecutor::StagedInput::operator=(
    StagedInput&&) noexcept = default;
PjrtExecutor::StagedInput::~StagedInput() = default;
PjrtExecutor::StagedInput::operator bool() const {
  return state_ != nullptr;
}

PjrtExecutor::StagedInput PjrtExecutor::StageInput(
    const std::vector<float>& input, const std::vector<int64_t>& dims) {
  const PJRT_Api* api = impl_->api;
  PJRT_Client_BufferFromHostBuffer_Args h2d;
  std::memset(&h2d, 0, sizeof(h2d));
  h2d.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  h2d.client = impl_->client;
  h2d.data = input.data();
  h2d.type = PJRT_Buffer_Type_F32;
  h2d.dims = dims.data();
  h2d.num_dims = dims.size();
  h2d.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  h2d.device = impl_->device;
  Check(api, api->PJRT_Client_BufferFromHostBuffer(&h2d),
        "BufferFromHostBuffer");
  StagedInput staged;
  staged.state_.reset(new StagedInput::State);
  staged.state_->api = api;
  staged.state_->buffer = h2d.buffer;
  staged.state_->host_done = h2d.done_with_host_buffer;
  return staged;
}

std::vector<float> PjrtExecutor::ExecuteStaged(StagedInput staged,
                                               std::vector<int64_t>* out_dims) {
  if (!staged) throw std::runtime_error("ExecuteStaged: empty handle");
  const PJRT_Api* api = impl_->api;
  PJRT_Buffer* arg = staged.state_->buffer;

  PJRT_ExecuteOptions options;
  std::memset(&options, 0, sizeof(options));
  options.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

  PJRT_Buffer* const arg_list[] = {arg};
  PJRT_Buffer* const* const arg_lists[] = {arg_list};
  PJRT_Buffer* out_list[1] = {nullptr};
  PJRT_Buffer** const out_lists[] = {out_list};
  PJRT_Event* done[1] = {nullptr};

  PJRT_LoadedExecutable_Execute_Args exec;
  std::memset(&exec, 0, sizeof(exec));
  exec.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
  exec.executable = impl_->executable;
  exec.options = &options;
  exec.argument_lists = arg_lists;
  exec.num_devices = 1;
  exec.num_args = 1;
  exec.output_lists = const_cast<PJRT_Buffer** const*>(out_lists);
  exec.device_complete_events = done;
  Check(api, api->PJRT_LoadedExecutable_Execute(&exec), "Execute");
  AwaitEvent(api, done[0], "execution");

  PJRT_Buffer* out = out_list[0];
  BufferGuard out_guard(api, out);
  if (out_dims != nullptr) {
    PJRT_Buffer_Dimensions_Args dargs;
    std::memset(&dargs, 0, sizeof(dargs));
    dargs.struct_size = PJRT_Buffer_Dimensions_Args_STRUCT_SIZE;
    dargs.buffer = out;
    Check(api, api->PJRT_Buffer_Dimensions(&dargs), "Buffer_Dimensions");
    out_dims->assign(dargs.dims, dargs.dims + dargs.num_dims);
  }

  PJRT_Buffer_ToHostBuffer_Args d2h;
  std::memset(&d2h, 0, sizeof(d2h));
  d2h.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  d2h.src = out;
  Check(api, api->PJRT_Buffer_ToHostBuffer(&d2h), "ToHostBuffer size query");
  std::vector<float> result(d2h.dst_size / sizeof(float));
  d2h.dst = result.data();
  Check(api, api->PJRT_Buffer_ToHostBuffer(&d2h), "ToHostBuffer");
  AwaitEvent(api, d2h.event, "device-to-host transfer");
  return result;
  // ~staged: awaits the host-transfer event and frees the input buffer.
}

std::vector<float> PjrtExecutor::RunOnce(const std::vector<float>& input,
                                         const std::vector<int64_t>& dims,
                                         std::vector<int64_t>* out_dims) {
  return ExecuteStaged(StageInput(input, dims), out_dims);
}

Executor PjrtExecutor::AsExecutor(int64_t compiled_batch) {
  return [this, compiled_batch](const std::vector<float>& patches, int64_t n,
                                const std::array<int64_t, 3>& patch,
                                int64_t num_classes) {
    const int64_t voxels = patch[0] * patch[1] * patch[2];
    if (compiled_batch <= 0 || n == compiled_batch) {
      std::vector<int64_t> dims = {n, patch[0], patch[1], patch[2], 1};
      return Run(patches, dims);
    }
    // chunk to the executable's fixed batch; pad the tail by repeating
    // the last patch (extra rows are sliced off — same contract as the
    // Python evaluator's grid padding, vnet_tpu/infer/sliding_window.py).
    // Double-buffered: chunk k+1's host->device DMA is staged before chunk
    // k executes, so the transfer rides under the device compute.
    std::vector<int64_t> dims = {compiled_batch, patch[0], patch[1],
                                 patch[2], 1};
    std::vector<float> out;
    out.reserve(static_cast<size_t>(n) * voxels * num_classes);
    std::vector<float> chunk[2];
    chunk[0].resize(static_cast<size_t>(compiled_batch) * voxels);
    chunk[1].resize(static_cast<size_t>(compiled_batch) * voxels);

    auto fill = [&](int slot, int64_t start) {
      const int64_t m = std::min(compiled_batch, n - start);
      std::memcpy(chunk[slot].data(), patches.data() + start * voxels,
                  static_cast<size_t>(m) * voxels * sizeof(float));
      for (int64_t pad = m; pad < compiled_batch; ++pad) {
        std::memcpy(chunk[slot].data() + pad * voxels,
                    chunk[slot].data() + (m - 1) * voxels,
                    static_cast<size_t>(voxels) * sizeof(float));
      }
      return m;
    };
    // execute with one retry that restages from the still-live host chunk
    // (mirrors Run()'s transient-failure policy; the staged handle is
    // consumed by the failed attempt)
    auto exec_chunk = [&](StagedInput staged, int slot) {
      try {
        return ExecuteStaged(std::move(staged));
      } catch (const PjrtError& e) {
        if (!e.transient()) throw;
        std::fprintf(stderr,
                     "PjrtExecutor: staged execute failed (%s); retrying\n",
                     e.what());
        return ExecuteStaged(StageInput(chunk[slot], dims));
      }
    };

    int cur = 0;
    int64_t m_cur = fill(cur, 0);
    StagedInput staged = StageInput(chunk[cur], dims);
    for (int64_t start = 0; start < n; start += compiled_batch) {
      const int64_t next = start + compiled_batch;
      int64_t m_next = 0;
      StagedInput staged_next;
      if (next < n) {
        m_next = fill(1 - cur, next);
        staged_next = StageInput(chunk[1 - cur], dims);
      }
      std::vector<float> probs = exec_chunk(std::move(staged), cur);
      out.insert(
          out.end(), probs.begin(),
          probs.begin() + static_cast<size_t>(m_cur) * voxels * num_classes);
      cur = 1 - cur;
      m_cur = m_next;
      staged = std::move(staged_next);
    }
    return out;
  };
}

}  // namespace vnet
