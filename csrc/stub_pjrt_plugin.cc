// Stub PJRT plugin — a minimal shared object exporting GetPjrtApi() so the
// native executor (pjrt_executor.cc) can be exercised end-to-end in CI
// without TPU hardware. The reference had no test harness for its device
// path at all (SURVEY.md §4); here the full dlopen → client create →
// compile → buffer streaming → execute → fetch flow runs against this
// stub, including injected failures for the retry logic.
//
// Semantics of the "compiled" function (fixed, program text is ignored):
//   input  f32[n, d, h, w, 1]
//   output f32[n, d, h, w, 2] with p1 = clamp(x / 255, 0, 1), p0 = 1 - p1
// (a linear ramp over the client's [0,255] windowed intensity range, so
// thresholding at 0.5 discriminates bright vs dark voxels)
//
// Create options understood:
//   stub_fail_executes (int64): first K Execute calls return an error.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

struct ErrorImpl {
  std::string message;
  int code = 14;  // PJRT_Error_Code_UNAVAILABLE (transient) by default
};

}  // namespace

// PJRT opaque types are defined by the plugin.
struct PJRT_Error {
  ErrorImpl impl;
};
struct PJRT_Event {};
struct PJRT_Device {};
struct PJRT_Client {
  int64_t fail_executes = 0;
  int64_t fail_code = 14;  // code injected failures carry (UNAVAILABLE)
  PJRT_Device device;
  PJRT_Device* devices[1];
};
struct PJRT_LoadedExecutable {
  PJRT_Client* client = nullptr;
};
struct PJRT_Buffer {
  std::vector<float> data;
  std::vector<int64_t> dims;
};

namespace {

PJRT_Error* MakeError(const std::string& msg,
                      int code = 3 /* INVALID_ARGUMENT */) {
  auto* e = new PJRT_Error;
  e->impl.message = msg;
  e->impl.code = code;
  return e;
}

void ErrorDestroy(PJRT_Error_Destroy_Args* args) { delete args->error; }

void ErrorMessage(PJRT_Error_Message_Args* args) {
  args->message = args->error->impl.message.c_str();
  args->message_size = args->error->impl.message.size();
}

PJRT_Error* ErrorGetCode(PJRT_Error_GetCode_Args* args) {
  args->code = static_cast<PJRT_Error_Code>(args->error->impl.code);
  return nullptr;
}

PJRT_Error* PluginInitialize(PJRT_Plugin_Initialize_Args*) { return nullptr; }

PJRT_Error* ClientCreate(PJRT_Client_Create_Args* args) {
  auto* c = new PJRT_Client;
  c->devices[0] = &c->device;
  for (size_t i = 0; i < args->num_options; ++i) {
    const PJRT_NamedValue& nv = args->create_options[i];
    std::string name(nv.name, nv.name_size);
    if (name == "stub_fail_executes" && nv.type == PJRT_NamedValue_kInt64) {
      c->fail_executes = nv.int64_value;
    }
    if (name == "stub_fail_code" && nv.type == PJRT_NamedValue_kInt64) {
      c->fail_code = nv.int64_value;
    }
  }
  args->client = c;
  return nullptr;
}

PJRT_Error* ClientDestroy(PJRT_Client_Destroy_Args* args) {
  delete args->client;
  return nullptr;
}

PJRT_Error* ClientPlatformName(PJRT_Client_PlatformName_Args* args) {
  static const char kName[] = "stub";
  args->platform_name = kName;
  args->platform_name_size = sizeof(kName) - 1;
  return nullptr;
}

PJRT_Error* ClientAddressableDevices(
    PJRT_Client_AddressableDevices_Args* args) {
  args->addressable_devices = args->client->devices;
  args->num_addressable_devices = 1;
  return nullptr;
}

PJRT_Error* ClientCompile(PJRT_Client_Compile_Args* args) {
  if (args->program == nullptr || args->program->code_size == 0) {
    return MakeError("stub: empty program");
  }
  auto* exe = new PJRT_LoadedExecutable;
  exe->client = args->client;
  args->executable = exe;
  return nullptr;
}

PJRT_Error* LoadedExecutableDestroy(
    PJRT_LoadedExecutable_Destroy_Args* args) {
  delete args->executable;
  return nullptr;
}

PJRT_Error* EventAwait(PJRT_Event_Await_Args*) { return nullptr; }

PJRT_Error* EventDestroy(PJRT_Event_Destroy_Args* args) {
  delete args->event;
  return nullptr;
}

PJRT_Error* BufferFromHostBuffer(
    PJRT_Client_BufferFromHostBuffer_Args* args) {
  if (args->type != PJRT_Buffer_Type_F32) {
    return MakeError("stub: only F32 buffers supported");
  }
  int64_t count = 1;
  for (size_t i = 0; i < args->num_dims; ++i) count *= args->dims[i];
  auto* buf = new PJRT_Buffer;
  buf->dims.assign(args->dims, args->dims + args->num_dims);
  const float* src = static_cast<const float*>(args->data);
  buf->data.assign(src, src + count);
  args->buffer = buf;
  args->done_with_host_buffer = new PJRT_Event;
  return nullptr;
}

PJRT_Error* BufferDestroy(PJRT_Buffer_Destroy_Args* args) {
  delete args->buffer;
  return nullptr;
}

PJRT_Error* BufferDimensions(PJRT_Buffer_Dimensions_Args* args) {
  args->dims = args->buffer->dims.data();
  args->num_dims = args->buffer->dims.size();
  return nullptr;
}

PJRT_Error* BufferToHostBuffer(PJRT_Buffer_ToHostBuffer_Args* args) {
  const size_t bytes = args->src->data.size() * sizeof(float);
  if (args->dst == nullptr) {
    args->dst_size = bytes;
    return nullptr;
  }
  if (args->dst_size < bytes) return MakeError("stub: dst too small");
  std::memcpy(args->dst, args->src->data.data(), bytes);
  args->event = new PJRT_Event;
  return nullptr;
}

PJRT_Error* LoadedExecutableExecute(
    PJRT_LoadedExecutable_Execute_Args* args) {
  PJRT_Client* client = args->executable->client;
  if (client->fail_executes > 0) {
    --client->fail_executes;
    return MakeError("stub: injected execute failure",
                     static_cast<int>(client->fail_code));
  }
  if (args->num_devices != 1 || args->num_args != 1) {
    return MakeError("stub: expected 1 device / 1 arg");
  }
  const PJRT_Buffer* in = args->argument_lists[0][0];
  if (in->dims.empty() || in->dims.back() != 1) {
    return MakeError("stub: expected trailing channel dim of 1");
  }
  auto* out = new PJRT_Buffer;
  out->dims = in->dims;
  out->dims.back() = 2;
  out->data.resize(in->data.size() * 2);
  for (size_t i = 0; i < in->data.size(); ++i) {
    float p1 = in->data[i] / 255.0f;
    p1 = p1 < 0.0f ? 0.0f : (p1 > 1.0f ? 1.0f : p1);
    out->data[2 * i] = 1.0f - p1;
    out->data[2 * i + 1] = p1;
  }
  args->output_lists[0][0] = out;
  if (args->device_complete_events != nullptr) {
    args->device_complete_events[0] = new PJRT_Event;
  }
  return nullptr;
}

}  // namespace

extern "C" const PJRT_Api* GetPjrtApi() {
  static PJRT_Api api = [] {
    PJRT_Api a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Api_STRUCT_SIZE;
    a.pjrt_api_version.major_version = PJRT_API_MAJOR;
    a.pjrt_api_version.minor_version = PJRT_API_MINOR;
    a.PJRT_Error_Destroy = ErrorDestroy;
    a.PJRT_Error_Message = ErrorMessage;
    a.PJRT_Error_GetCode = ErrorGetCode;
    a.PJRT_Plugin_Initialize = PluginInitialize;
    a.PJRT_Event_Await = EventAwait;
    a.PJRT_Event_Destroy = EventDestroy;
    a.PJRT_Client_Create = ClientCreate;
    a.PJRT_Client_Destroy = ClientDestroy;
    a.PJRT_Client_PlatformName = ClientPlatformName;
    a.PJRT_Client_AddressableDevices = ClientAddressableDevices;
    a.PJRT_Client_Compile = ClientCompile;
    a.PJRT_LoadedExecutable_Destroy = LoadedExecutableDestroy;
    a.PJRT_Client_BufferFromHostBuffer = BufferFromHostBuffer;
    a.PJRT_Buffer_Destroy = BufferDestroy;
    a.PJRT_Buffer_Dimensions = BufferDimensions;
    a.PJRT_Buffer_ToHostBuffer = BufferToHostBuffer;
    a.PJRT_LoadedExecutable_Execute = LoadedExecutableExecute;
    return a;
  }();
  return &api;
}
