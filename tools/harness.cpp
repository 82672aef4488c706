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

#include <cerrno>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <fcntl.h>
#include <libgen.h>
#include <sys/select.h>
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
  int in_fd = to_child[1], out_fd = from_child[0];

  // Init phase: the engine produces no output before the first 'F', so a
  // blocking write of the relation list cannot deadlock.
  {
    std::string s;
    for (auto& l : init)
      if (!l.empty()) { s += l; s += '\n'; }
    s += "Done\n";
    size_t off = 0;
    while (off < s.size()) {
      ssize_t w = write(in_fd, s.data() + off, s.size() - off);
      if (w <= 0) { perror("write init"); return 2; }
      off += (size_t)w;
    }
  }
  usleep((useconds_t)(prep_s * 1e6));  // untimed prep window

  // Batch phase: a select() loop feeds the batch while draining results.
  // Writing a whole batch before reading deadlocks once the engine fills
  // its stdout pipe while our stdin pipe is also full (both ends block) —
  // a 10-query batch never hits it, a 5000-query batch does.
  fcntl(in_fd, F_SETFL, O_NONBLOCK);
  int failures = 0, total = 0;
  size_t expect_i = 0;
  std::string rdbuf;  // carries partial lines across select rounds
  auto t0 = std::chrono::steady_clock::now();
  for (auto& batch : batches) {
    std::string outbuf;
    for (auto& q : batch) { outbuf += q; outbuf += '\n'; }
    outbuf += "F\n";
    size_t sent = 0, got_lines = 0;
    while (got_lines < batch.size()) {
      fd_set rfds, wfds;
      FD_ZERO(&rfds);
      FD_ZERO(&wfds);
      FD_SET(out_fd, &rfds);
      if (sent < outbuf.size()) FD_SET(in_fd, &wfds);
      int nfds = (in_fd > out_fd ? in_fd : out_fd) + 1;
      if (select(nfds, &rfds, sent < outbuf.size() ? &wfds : nullptr,
                 nullptr, nullptr) < 0) {
        perror("select");
        return 2;
      }
      if (sent < outbuf.size() && FD_ISSET(in_fd, &wfds)) {
        ssize_t w = write(in_fd, outbuf.data() + sent, outbuf.size() - sent);
        if (w > 0) sent += (size_t)w;
        else if (w < 0 && errno != EAGAIN && errno != EWOULDBLOCK) {
          perror("write");
          return 1;
        }
      }
      if (FD_ISSET(out_fd, &rfds)) {
        char buf[1 << 16];
        ssize_t r = read(out_fd, buf, sizeof buf);
        if (r == 0) {
          std::cerr << "engine closed stdout early\n";
          return 1;
        }
        if (r < 0) {
          if (errno == EAGAIN || errno == EINTR) continue;
          perror("read");
          return 1;
        }
        rdbuf.append(buf, (size_t)r);
        size_t nl;
        while (got_lines < batch.size() &&
               (nl = rdbuf.find('\n')) != std::string::npos) {
          std::string got = rdbuf.substr(0, nl);
          rdbuf.erase(0, nl + 1);
          if (!got.empty() && got.back() == '\r') got.pop_back();
          ++got_lines;
          while (expect_i < expect.size() && expect[expect_i].empty())
            ++expect_i;
          const std::string want =
              expect_i < expect.size() ? expect[expect_i++] : std::string();
          ++total;
          if (got != want) {
            ++failures;
            std::cerr << "MISMATCH q" << total << ": got '" << got
                      << "' want '" << want << "'\n";
            if (failures >= kMaxFailures) {
              std::cerr << "too many failures, aborting\n";
              return 1;
            }
          }
        }
      }
    }
  }
  auto ms = std::chrono::duration_cast<std::chrono::milliseconds>(
                std::chrono::steady_clock::now() - t0)
                .count();
  fcntl(in_fd, F_SETFL, 0);  // back to blocking for the farewell
  {
    const char* bye = "Exit\n";
    if (write(in_fd, bye, 5) != 5) { /* engine may already be gone */ }
  }
  close(in_fd);
  close(out_fd);
  waitpid(pid, nullptr, 0);

  if (failures == 0) {
    printf("%d queries, 0 mismatches, %ld ms\n", total, (long)ms);
    return 0;
  }
  fprintf(stderr, "%d/%d mismatches\n", failures, total);
  return 1;
}
