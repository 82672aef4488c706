// Native test harness — C++ port mirroring submission/harness.cpp:
// fork/exec the engine, stream the .init file + "Done", wait the untimed
// prep window, then feed query batches and diff each output line against
// the expected .result; print elapsed ms iff zero mismatches.
//
// Differences from the reference kept deliberately: the engine command is
// taken from argv (default: python -m sigmod2018_tpu) instead of a run.sh,
// and the prep wait is configurable (reference hard-codes 1 s,
// harness.cpp:175-177).
//
// Build:  g++ -O2 -std=c++17 -o build/harness tools/harness.cpp
// Usage:  harness INIT WORK RESULT [PREP_SECONDS [CMD ARGS...]]

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <libgen.h>
#include <sys/wait.h>
#include <unistd.h>

static constexpr int kMaxFailures = 100;  // harness.cpp:16

static std::vector<std::string> readLines(const char* path) {
  std::ifstream f(path);
  if (!f) {
    std::cerr << "cannot open " << path << "\n";
    exit(2);
  }
  std::vector<std::string> lines;
  std::string l;
  while (std::getline(f, l)) {
    while (!l.empty() && (l.back() == '\r' || l.back() == '\n')) l.pop_back();
    lines.push_back(l);
  }
  return lines;
}

int main(int argc, char** argv) {
  if (argc < 4) {
    std::cerr << "usage: harness INIT WORK RESULT [PREP_SECONDS [CMD...]]\n";
    return 2;
  }
  double prep_s = argc > 4 ? atof(argv[4]) : 1.0;
  std::vector<char*> cmd;
  if (argc > 5) {
    for (int i = 5; i < argc; ++i) cmd.push_back(argv[i]);
  } else {
    static char py[] = "python", m[] = "-m", mod[] = "sigmod2018_tpu";
    cmd = {py, m, mod};
  }
  cmd.push_back(nullptr);

  auto init = readLines(argv[1]);
  auto work = readLines(argv[2]);
  auto expect = readLines(argv[3]);

  // Batches: queries until 'F'; expected lines consumed in order.
  std::vector<std::vector<std::string>> batches(1);
  for (auto& l : work) {
    if (l.empty()) continue;
    if (l == "F") {
      if (!batches.back().empty()) batches.emplace_back();
    } else {
      batches.back().push_back(l);
    }
  }
  if (batches.back().empty()) batches.pop_back();

  int to_child[2], from_child[2];
  if (pipe(to_child) || pipe(from_child)) { perror("pipe"); return 2; }
  pid_t pid = fork();
  if (pid < 0) { perror("fork"); return 2; }
  if (pid == 0) {
    dup2(to_child[0], 0);
    dup2(from_child[1], 1);
    close(to_child[1]);
    close(from_child[0]);
    // Relation paths in .init resolve relative to the init file's dir
    // (run.sh does the equivalent cd, runTestharness.sh:4-11).
    std::string dir = argv[1];
    char* d = dirname(dir.data());
    if (chdir(d) != 0) perror("chdir");
    execvp(cmd[0], cmd.data());
    perror("execvp");
    _exit(127);
  }
  close(to_child[0]);
  close(from_child[1]);
  FILE* in = fdopen(to_child[1], "w");
  FILE* out = fdopen(from_child[0], "r");

  for (auto& l : init) {
    if (!l.empty()) fprintf(in, "%s\n", l.c_str());
  }
  fprintf(in, "Done\n");
  fflush(in);
  usleep((useconds_t)(prep_s * 1e6));  // untimed prep window

  int failures = 0, total = 0;
  size_t expect_i = 0;
  auto t0 = std::chrono::steady_clock::now();
  char buf[1 << 16];
  for (auto& batch : batches) {
    for (auto& q : batch) fprintf(in, "%s\n", q.c_str());
    fprintf(in, "F\n");
    fflush(in);
    for (size_t i = 0; i < batch.size(); ++i) {
      if (!fgets(buf, sizeof buf, out)) {
        std::cerr << "engine closed stdout early\n";
        return 1;
      }
      std::string got(buf);
      while (!got.empty() && (got.back() == '\n' || got.back() == '\r'))
        got.pop_back();
      while (expect_i < expect.size() && expect[expect_i].empty()) ++expect_i;
      const std::string& want =
          expect_i < expect.size() ? expect[expect_i++] : std::string();
      ++total;
      if (got != want) {
        ++failures;
        std::cerr << "MISMATCH q" << total << ": got '" << got << "' want '"
                  << want << "'\n";
        if (failures >= kMaxFailures) {
          std::cerr << "too many failures, aborting\n";
          return 1;
        }
      }
    }
  }
  auto ms = std::chrono::duration_cast<std::chrono::milliseconds>(
                std::chrono::steady_clock::now() - t0)
                .count();
  fprintf(in, "Exit\n");
  fflush(in);
  fclose(in);
  fclose(out);
  waitpid(pid, nullptr, 0);

  if (failures == 0) {
    printf("%d queries, 0 mismatches, %ld ms\n", total, (long)ms);
    return 0;
  }
  fprintf(stderr, "%d/%d mismatches\n", failures, total);
  return 1;
}
