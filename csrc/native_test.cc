// C++ unit tests for the native runtime (no external test framework:
// assert-based, run via ctest; ASAN/TSAN variants via -DVNET_ASAN/TSAN).

#include <cassert>
#include <cmath>
#include <cstdio>
#include <numeric>
#include <vector>

#include "inference_client.h"
#include "safe_queue.h"
#include "thread_pool.h"

extern "C" {
void vnet_window_normalize(const float*, float*, int64_t, float, float, float,
                           float);
int64_t vnet_patch_grid(const int64_t*, const int64_t*, const int64_t*,
                        int64_t*, int64_t);
void vnet_extract_patches(const float*, const int64_t*, int64_t,
                          const int64_t*, const int64_t*, int64_t, float*,
                          int);
void vnet_blend_accumulate(float*, float*, const int64_t*, int64_t,
                           const float*, const float*, const int64_t*,
                           const int64_t*, int64_t);
}

#define CHECK(cond)                                             \
  do {                                                          \
    if (!(cond)) {                                              \
      std::fprintf(stderr, "FAILED: %s at %s:%d\n", #cond,      \
                   __FILE__, __LINE__);                         \
      return 1;                                                 \
    }                                                           \
  } while (0)

static int TestThreadPool() {
  vnet::ThreadPool pool(4);
  std::vector<std::future<int>> futs;
  for (int i = 0; i < 100; ++i) {
    futs.push_back(pool.Submit([i] { return i * i; }));
  }
  long sum = 0;
  for (auto& f : futs) sum += f.get();
  CHECK(sum == 328350);
  return 0;
}

static int TestSafeQueue() {
  vnet::SafeQueue<int> q(4);
  std::thread producer([&] {
    for (int i = 0; i < 50; ++i) q.Push(i);
    q.Close();
  });
  long sum = 0;
  int count = 0;
  while (auto v = q.Pop()) {
    sum += *v;
    ++count;
  }
  producer.join();
  CHECK(count == 50);
  CHECK(sum == 1225);
  return 0;
}

static int TestWindowNormalize() {
  float in[4] = {-100.f, 0.f, 300.f, 900.f};
  float out[4];
  vnet_window_normalize(in, out, 4, 0.f, 600.f, 0.f, 255.f);
  CHECK(out[0] == 0.f);
  CHECK(out[1] == 0.f);
  CHECK(std::fabs(out[2] - 127.5f) < 1e-3);
  CHECK(out[3] == 255.f);
  return 0;
}

static int TestPatchGrid() {
  // matches vnet_tpu.infer.patch_starts_1d: dim 10, patch 4, stride 4 ->
  // starts 0,4,6 per axis
  int64_t shape[3] = {10, 4, 4};
  int64_t patch[3] = {4, 4, 4};
  int64_t stride[3] = {4, 4, 4};
  int64_t n = vnet_patch_grid(shape, patch, stride, nullptr, 0);
  CHECK(n == 3);
  std::vector<int64_t> starts(3 * n);
  vnet_patch_grid(shape, patch, stride, starts.data(), n);
  CHECK(starts[0] == 0 && starts[3] == 4 && starts[6] == 6);
  return 0;
}

static int TestExtractAndBlend() {
  int64_t shape[3] = {6, 6, 6};
  std::vector<float> vol(216);
  std::iota(vol.begin(), vol.end(), 0.0f);
  int64_t patch[3] = {4, 4, 4};
  int64_t starts[6] = {0, 0, 0, 2, 2, 2};

  std::vector<float> patches(2 * 64);
  vnet_extract_patches(vol.data(), shape, 1, patch, starts, 2,
                       patches.data(), 2);
  // patch 0 element (1,2,3) = vol[1*36+2*6+3] = 51
  CHECK(patches[(1 * 4 + 2) * 4 + 3] == 51.0f);
  // patch 1 element (0,0,0) = vol[2*36+2*6+2] = 86
  CHECK(patches[64] == 86.0f);

  // blend: probs all ones, C=2
  std::vector<float> acc(216 * 2, 0.f), weight(216, 0.f);
  std::vector<float> probs(2 * 64 * 2, 1.0f), window(64, 1.0f);
  vnet_blend_accumulate(acc.data(), weight.data(), shape, 2, probs.data(),
                        window.data(), patch, starts, 2);
  // voxel (3,3,3) covered by both patches
  CHECK(weight[3 * 36 + 3 * 6 + 3] == 2.0f);
  CHECK(weight[0] == 1.0f);
  CHECK(weight[5 * 36 + 5 * 6 + 5] == 1.0f);
  CHECK(acc[(3 * 36 + 3 * 6 + 3) * 2 + 1] == 2.0f);
  return 0;
}

static int TestNiftiRoundtrip() {
  vnet::NiftiImage img;
  img.shape = {5, 4, 3};
  img.spacing = {1.5, 2.0, 2.5};
  img.origin = {-10, 4, 7.5};
  img.data.resize(60);
  std::iota(img.data.begin(), img.data.end(), 0.0f);

  const std::string path = "/tmp/vnet_native_test.nii.gz";
  vnet::WriteNifti(img, path);
  vnet::NiftiImage back = vnet::ReadNifti(path);
  CHECK(back.shape == img.shape);
  for (int i = 0; i < 3; ++i) {
    CHECK(std::fabs(back.spacing[i] - img.spacing[i]) < 1e-4);
    CHECK(std::fabs(back.origin[i] - img.origin[i]) < 1e-3);
  }
  for (size_t i = 0; i < img.data.size(); ++i) {
    CHECK(back.data[i] == img.data[i]);
  }
  return 0;
}

static int TestInferenceClientEndToEnd() {
  // bright cube in a dark volume; threshold executor must recover it
  vnet::NiftiImage input;
  input.shape = {24, 24, 24};
  input.spacing = {1, 1, 1};
  input.data.assign(24 * 24 * 24, 10.0f);
  for (int64_t x = 8; x < 16; ++x)
    for (int64_t y = 8; y < 16; ++y)
      for (int64_t z = 8; z < 16; ++z)
        input.data[(x * 24 + y) * 24 + z] = 400.0f;

  vnet::InferenceOptions opts;
  opts.patch_shape = {16, 16, 16};
  opts.stride = {8, 8, 8};
  opts.batch_size = 2;
  opts.num_classes = 2;
  opts.window_min = 0;
  opts.window_max = 600;
  opts.spacing = {1, 1, 1};
  opts.num_threads = 3;

  auto executor = [](const std::vector<float>& patches, int64_t n,
                     const std::array<int64_t, 3>& patch, int64_t classes) {
    const int64_t elems = patch[0] * patch[1] * patch[2];
    std::vector<float> probs((size_t)(n * elems * classes), 0.f);
    for (int64_t i = 0; i < n * elems; ++i) {
      const bool fg = patches[(size_t)i] > 100.0f;
      probs[(size_t)(i * classes)] = fg ? 0.f : 1.f;
      probs[(size_t)(i * classes + 1)] = fg ? 1.f : 0.f;
    }
    return probs;
  };

  vnet::InferenceClient client(opts, executor);
  vnet::NiftiImage label = client.Run(input);
  CHECK(label.shape == input.shape);
  CHECK(label.data[(12 * 24 + 12) * 24 + 12] == 1.0f);
  CHECK(label.data[(2 * 24 + 2) * 24 + 2] == 0.0f);
  return 0;
}

static int TestInferenceClientExecutorFailure() {
  // an executor that throws mid-run must surface the error (not hang the
  // producer/pipeline) and leave the client reusable
  vnet::NiftiImage input;
  input.shape = {16, 16, 16};
  input.spacing = {1, 1, 1};
  input.data.assign(16 * 16 * 16, 10.0f);

  vnet::InferenceOptions opts;
  opts.patch_shape = {8, 8, 8};
  opts.stride = {8, 8, 8};
  opts.batch_size = 2;
  opts.num_classes = 2;
  opts.window_min = 0;
  opts.window_max = 600;
  opts.num_threads = 2;

  int calls = 0;
  auto executor = [&calls](const std::vector<float>& patches, int64_t n,
                           const std::array<int64_t, 3>& patch,
                           int64_t classes) -> std::vector<float> {
    if (++calls == 2) throw std::runtime_error("boom");
    const int64_t elems = patch[0] * patch[1] * patch[2];
    return std::vector<float>((size_t)(n * elems * classes), 0.5f);
  };
  vnet::InferenceClient client(opts, executor);
  bool threw = false;
  try {
    client.Run(input);
  } catch (const std::exception& e) {
    threw = std::string(e.what()) == "boom";
  }
  CHECK(threw);
  return 0;
}

#ifdef STUB_PJRT_PLUGIN
#include "pjrt_executor.h"

// Full PJRT flow against the stub plugin: dlopen -> client (with
// NamedValue options) -> compile -> H2D -> execute -> D2H. The stub's
// "program" computes p1 = clamp(x/255, 0, 1).
static int TestPjrtExecutorAgainstStub() {
  vnet::PjrtExecutor exec(STUB_PJRT_PLUGIN, "func @main { stub }");
  CHECK(exec.platform_name() == "stub");

  std::vector<float> input = {-2.f, 0.f, 51.f, 255.f};
  std::vector<int64_t> dims = {1, 2, 2, 1, 1};
  std::vector<int64_t> out_dims;
  std::vector<float> probs = exec.Run(input, dims, &out_dims);
  CHECK(out_dims.size() == 5 && out_dims.back() == 2);
  CHECK(probs.size() == 8);
  const float expected[] = {0.f, 0.f, 0.2f, 1.f};
  for (size_t i = 0; i < input.size(); ++i) {
    CHECK(std::fabs(probs[2 * i + 1] - expected[i]) < 1e-5f);
    CHECK(std::fabs(probs[2 * i] + probs[2 * i + 1] - 1.0f) < 1e-5f);
  }
  return 0;
}

// Retry logic: the first Execute fails (injected via a create option);
// Run's second attempt must succeed.
static int TestPjrtExecutorRetry() {
  std::vector<vnet::PjrtExecutor::Option> options(1);
  options[0].name = "stub_fail_executes";
  options[0].int_value = 1;
  vnet::PjrtExecutor exec(STUB_PJRT_PLUGIN, "stub", options);
  std::vector<float> input = {127.5f};
  std::vector<float> probs = exec.Run(input, {1, 1, 1, 1, 1});
  CHECK(probs.size() == 2);
  CHECK(std::fabs(probs[1] - 0.5f) < 1e-6f);

  // two consecutive failures exhaust max_attempts=2 -> throws
  options[0].int_value = 2;
  vnet::PjrtExecutor exec2(STUB_PJRT_PLUGIN, "stub", options);
  bool threw = false;
  try {
    exec2.Run(input, {1, 1, 1, 1, 1});
  } catch (const std::exception&) {
    threw = true;
  }
  CHECK(threw);
  return 0;
}

// Deterministic failures (e.g. INVALID_ARGUMENT) must NOT be retried:
// with a single injected failure carrying code 3, a retry would succeed —
// so Run throwing proves the error propagated on the first attempt.
static int TestPjrtExecutorNoRetryOnDeterministicError() {
  std::vector<vnet::PjrtExecutor::Option> options(2);
  options[0].name = "stub_fail_executes";
  options[0].int_value = 1;
  options[1].name = "stub_fail_code";
  options[1].int_value = 3;  // PJRT_Error_Code_INVALID_ARGUMENT
  vnet::PjrtExecutor exec(STUB_PJRT_PLUGIN, "stub", options);
  std::vector<float> input = {127.5f};
  bool threw = false;
  try {
    exec.Run(input, {1, 1, 1, 1, 1});
  } catch (const vnet::PjrtError& e) {
    threw = true;
    CHECK(e.code() == 3);
    CHECK(!e.transient());
  }
  CHECK(threw);
  // same injection with a transient code IS retried and succeeds
  options[1].int_value = 14;  // UNAVAILABLE
  vnet::PjrtExecutor exec2(STUB_PJRT_PLUGIN, "stub", options);
  std::vector<float> probs = exec2.Run(input, {1, 1, 1, 1, 1});
  CHECK(probs.size() == 2);
  return 0;
}

// Batch bucketing: a 5-patch request through an executable compiled for
// batch 2 (3 chunks, padded tail), validated against direct math.
static int TestPjrtExecutorBatchBucketing() {
  vnet::PjrtExecutor exec(STUB_PJRT_PLUGIN, "stub");
  vnet::Executor run = exec.AsExecutor(/*compiled_batch=*/2);
  const std::array<int64_t, 3> patch = {1, 1, 2};
  std::vector<float> patches = {0.f, 1.f, 2.f, 3.f, 4.f,
                                5.f, 6.f, 7.f, 8.f, 9.f};  // n=5, 2 voxels
  std::vector<float> probs = run(patches, 5, patch, 2);
  CHECK(probs.size() == 5 * 2 * 2);
  for (size_t i = 0; i < patches.size(); ++i) {
    CHECK(std::fabs(probs[2 * i + 1] - patches[i] / 255.0f) < 1e-5f);
  }
  return 0;
}

// Staged H2D API: handle semantics (empty, move, abandon-without-execute)
// and value correctness through StageInput -> ExecuteStaged.
static int TestPjrtExecutorStagedInput() {
  vnet::PjrtExecutor exec(STUB_PJRT_PLUGIN, "stub");

  vnet::PjrtExecutor::StagedInput empty;
  CHECK(!empty);
  bool threw = false;
  try {
    exec.ExecuteStaged(std::move(empty));
  } catch (const std::exception&) {
    threw = true;
  }
  CHECK(threw);

  std::vector<float> input = {51.f, 255.f};
  std::vector<int64_t> dims = {1, 1, 1, 2, 1};
  vnet::PjrtExecutor::StagedInput staged = exec.StageInput(input, dims);
  CHECK(static_cast<bool>(staged));
  vnet::PjrtExecutor::StagedInput moved = std::move(staged);
  CHECK(static_cast<bool>(moved) && !staged);
  std::vector<int64_t> out_dims;
  std::vector<float> probs = exec.ExecuteStaged(std::move(moved), &out_dims);
  CHECK(out_dims.back() == 2 && probs.size() == 4);
  CHECK(std::fabs(probs[1] - 0.2f) < 1e-5f);
  CHECK(std::fabs(probs[3] - 1.0f) < 1e-5f);

  // abandoning a staged handle must clean up without executing
  { vnet::PjrtExecutor::StagedInput dropped = exec.StageInput(input, dims); }
  return 0;
}

// Transient failure inside the double-buffered chunk loop: the staged
// handle is consumed by the failed Execute; the loop must restage from the
// still-live host chunk and produce correct results for ALL chunks.
static int TestPjrtExecutorPipelinedRetry() {
  std::vector<vnet::PjrtExecutor::Option> options(1);
  options[0].name = "stub_fail_executes";
  options[0].int_value = 1;  // chunk 0's first execute fails
  vnet::PjrtExecutor exec(STUB_PJRT_PLUGIN, "stub", options);
  vnet::Executor run = exec.AsExecutor(/*compiled_batch=*/2);
  const std::array<int64_t, 3> patch = {1, 1, 2};
  std::vector<float> patches = {0.f, 1.f, 2.f, 3.f, 4.f,
                                5.f, 6.f, 7.f, 8.f, 9.f};
  std::vector<float> probs = run(patches, 5, patch, 2);
  CHECK(probs.size() == 5 * 2 * 2);
  for (size_t i = 0; i < patches.size(); ++i) {
    CHECK(std::fabs(probs[2 * i + 1] - patches[i] / 255.0f) < 1e-5f);
  }
  return 0;
}

// End-to-end: InferenceClient with the PJRT executor (stub plugin) as its
// device backend — the full native production wiring.
static int TestInferenceClientWithPjrt() {
  vnet::NiftiImage input;
  input.shape = {16, 16, 16};
  input.spacing = {1.0, 1.0, 1.0};
  input.data.assign(16 * 16 * 16, -400.0f);
  // bright cube in the center: windowed+normalized then sigmoid > 0.5
  for (int x = 6; x < 10; ++x)
    for (int y = 6; y < 10; ++y)
      for (int z = 6; z < 10; ++z)
        input.data[(x * 16 + y) * 16 + z] = 500.0f;

  vnet::InferenceOptions opts;
  opts.patch_shape = {8, 8, 8};
  opts.stride = {8, 8, 8};
  opts.batch_size = 3;  // does not divide the 8-patch grid: tests padding
  opts.num_classes = 2;
  opts.window_min = -1000;
  opts.window_max = 1000;
  opts.num_threads = 2;

  vnet::PjrtExecutor exec(STUB_PJRT_PLUGIN, "stub");
  vnet::InferenceClient client(opts, exec.AsExecutor(opts.batch_size));
  vnet::NiftiImage label = client.Run(input);
  CHECK(label.shape == input.shape);
  CHECK(label.data[(8 * 16 + 8) * 16 + 8] == 1.0f);
  CHECK(label.data[(2 * 16 + 2) * 16 + 2] == 0.0f);
  return 0;
}
#endif  // STUB_PJRT_PLUGIN

int main() {
  int failures = 0;
  failures += TestThreadPool();
  failures += TestSafeQueue();
  failures += TestWindowNormalize();
  failures += TestPatchGrid();
  failures += TestExtractAndBlend();
  failures += TestNiftiRoundtrip();
  failures += TestInferenceClientEndToEnd();
  failures += TestInferenceClientExecutorFailure();
#ifdef STUB_PJRT_PLUGIN
  failures += TestPjrtExecutorAgainstStub();
  failures += TestPjrtExecutorRetry();
  failures += TestPjrtExecutorNoRetryOnDeterministicError();
  failures += TestPjrtExecutorBatchBucketing();
  failures += TestPjrtExecutorStagedInput();
  failures += TestPjrtExecutorPipelinedRetry();
  failures += TestInferenceClientWithPjrt();
#endif
  if (failures) {
    std::fprintf(stderr, "%d test(s) failed\n", failures);
    return 1;
  }
  std::printf("all native tests passed\n");
  return 0;
}
